package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.concurrent.Executors

import javax.imageio.ImageIO

/** Microbenchmark (optimization round, guide §1: measure first): is
  * `ImageIO.read`'s per-call registry lookup + stream wrapper a real cost
  * against a cached per-thread `ImageReader`, and does it contend across
  * threads? Runs both paths at 1 and N threads over an in-memory PNG.
  * `runMain graft.tools.DecodeBench [threads] [imagesPerThread]`
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toInt else 2000
    ImageIO.setUseCache(false)
    // one representative small PNG (the planted-corpus class)
    val img = new java.awt.image.BufferedImage(40, 28,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 40 * 28) { img.getRaster.setSample(i % 40, i / 40, 0, i % 251); i += 1 }
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    def viaImageIO(): Unit = {
      val r = ImageIO.read(new ByteArrayInputStream(png))
      assert(r.getWidth == 40)
    }
    val tlReader = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("png").next())
    def viaCachedReader(): Unit = {
      val reader = tlReader.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(png))
      reader.setInput(iis, true, true)
      val r = reader.read(0)
      iis.close()
      assert(r.getWidth == 40)
    }
    def run(label: String, t: Int, f: () => Unit): Unit = {
      val pool = Executors.newFixedThreadPool(t)
      val t0 = System.nanoTime()
      val futs = (1 to t).map(_ => pool.submit(new Runnable {
        def run(): Unit = { var k = 0; while (k < n) { f(); k += 1 } }
      }))
      futs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      println(f"[decode-bench] $label%-24s threads=$t%3d  total=${t * n}%8d imgs  " +
        f"wall=$dt%7.3f s  ${t * n / dt / 1000}%8.1f k imgs/s")
    }
    // warmup
    (1 to 500).foreach(_ => { viaImageIO(); viaCachedReader() })
    run("ImageIO.read", 1, viaImageIO _)
    run("cached reader", 1, viaCachedReader _)
    run("ImageIO.read", threads, viaImageIO _)
    run("cached reader", threads, viaCachedReader _)
  }
}
