package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, VideoHash}

/** Per-frame video dHashes + sub-sequence containment: the frame kernel
  * against an independent closed-form re-derivation over the
  * segment-grade planted GIF corpus, the containment truth (planted
  * frame ranges found, nothing else), frame-diversity of the fixture,
  * cap semantics, degradation, and the no-cartesian plan pin.
  */
class VideoSeqSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  /** Independent re-derivation of the segment-grade corpus geometry +
    * pixel rule + dHash grid, straight from the scaladocs.
    */
  private def refGeom(id: Long): (Long, Int, Int, Int, Int) = {
    val seg = id % 7 == 5
    val src = if (seg) id - 5 else id
    val off = if (seg) (1 + id % 5).toInt else 0
    val n = if (seg) 4 else (12 + id % 4).toInt
    (src, off, n, 8 + (src % 5).toInt, 10 + (src % 3).toInt)
  }

  private def refPx(src: Long, fAbs: Int, i: Int): Int =
    ((src * 11 + i.toLong * i * (3 + src % 31) + i.toLong * (13 + 7 * fAbs)
      + fAbs * 17L) % 256L).toInt

  private def refFrameHash(src: Long, fAbs: Int, w: Int, h: Int): Long = {
    def mean(x: Int, y: Int): Long = {
      val x0 = x * w / 9; val x1 = math.max((x + 1) * w / 9, x0 + 1)
      val y0 = y * h / 8; val y1 = math.max((y + 1) * h / 8, y0 + 1)
      val vals = for (r <- y0 until y1; c <- x0 until x1)
        yield refPx(src, fAbs, r * w + c).toLong
      vals.sum / ((y1 - y0).toLong * (x1 - x0))
    }
    (for (y <- 0 until 8; x <- 0 until 8) yield (y, x)).foldLeft(0L) {
      case (hh, (y, x)) =>
        if (mean(x, y) < mean(x + 1, y)) hh | (1L << (y * 8 + x)) else hh
    }
  }

  test("per-frame hashes over the segment-grade plant equal the " +
    "closed-form grid rule, absolute-frame arithmetic included (real " +
    "demux vs pure arithmetic)") {
    val got = VideoHash.frameHashes(Multimodal.plantGifsSeg(ids(25)))
      .collect()
    assert(got.nonEmpty && got.forall(_.getBoolean(8)))
    got.foreach { r =>
      val id = r.getLong(0)
      val (src, off, n, w, h) = refGeom(id)
      assert(r.getInt(1) == n, s"n_frames id=$id")
      val j = r.getInt(2)
      assert(r.getLong(3) == refFrameHash(src, off + j, w, h),
        s"fhash id=$id j=$j")
    }
    val counts = got.groupBy(_.getLong(0)).view.mapValues(_.length)
    (0L until 25L).foreach { id =>
      assert(counts(id) == refGeom(id)._3, s"row count id=$id")
    }
  }

  test("fixture frames are hash-diverse WITHIN a clip (the frame-axis " +
    "phase-twin guard: no additive-in-F rule)") {
    (0L until 12L).filter(_ % 7 != 5).foreach { id =>
      val (src, _, n, w, h) = refGeom(id)
      val hashes = (0 until n).map(f => refFrameHash(src, f, w, h))
      assert(hashes.distinct.size == n,
        s"container $id has duplicate frame hashes: $hashes")
    }
  }

  test("containment finds exactly the planted frame ranges: every segment " +
    "id (id % 7 = 5) contained in id-5 at offset 1 + id % 5 with all 4 " +
    "frames, and NOTHING else (zero natural containments)") {
    val pairs = VideoHash.containmentPairs(
      VideoHash.frameHashes(Multimodal.plantGifsSeg(ids(60))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2))
    val expected = (0L until 60L).filter(_ % 7 == 5)
      .map(id => (id, id - 5, 1 + id % 5, 4L)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == expected,
      s"got ${pairs.mkString(",")} expected ${expected.mkString(",")}")
  }

  test("a GIF re-encode (decode + re-write) preserves frame hashes — " +
    "containment survives a container transcode") {
    import spark.implicits._
    val orig = Multimodal.plantGifsSeg(ids(6)).select("media_id", "data")
    // re-encode: demux every frame, re-write the sequence with the same
    // real writer path the fixture uses
    val re = orig.as[(Long, Array[Byte])].collect().map { case (id, bytes) =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until n).foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(reader.read(f), null, null), null)
      }
      writer.endWriteSequence(); ios.close()
      reader.dispose(); writer.dispose()
      (id + 500L, bos.toByteArray)
    }.toSeq.toDF("media_id", "data")
    val both = orig.union(re)
    val fh = VideoHash.frameHashes(both).filter(col("decoded"))
      .select("media_id", "frame_idx", "fhash").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    fh.keys.filter(_._1 < 500).foreach { case (id, j) =>
      assert(fh((id, j)) == fh((id + 500, j)), s"transcode flipped id=$id j=$j")
    }
  }

  test("flat-frame degenerate cap: constant-pixel clips are dropped from " +
    "candidate generation; cap is a no-op on the planted corpus") {
    import spark.implicits._
    val gray = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val flat = (0 until 12).map { k =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until 5).foreach { _ =>
        val img = new java.awt.image.BufferedImage(
          10, 10, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      (2000L + k, bos.toByteArray)
    }.toDF("media_id", "data")
    val fh = VideoHash.frameHashes(flat)
    // 12 clips x 5 identical flat frames share one hash: bucket 60 > 50
    assert(VideoHash.containmentPairs(fh, maxBucketSize = 50).count() == 0)
    assert(VideoHash.containmentPairs(fh, maxBucketSize = Long.MaxValue)
      .count() > 0)
    val planted = VideoHash.frameHashes(Multimodal.plantGifsSeg(ids(40)))
    assert(VideoHash.containmentPairs(planted).count() ==
      VideoHash.containmentPairs(planted, Long.MaxValue).count())
  }

  test("corrupt and empty payloads degrade to decoded=false; containment " +
    "over them is empty, not an error") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "data")
    val rows = VideoHash.frameHashes(df)
      .collect().map(r => (r.getLong(0), r.getBoolean(8))).sorted
    assert(rows.toSeq == Seq((1L, false), (2L, false)))
    assert(VideoHash.containmentPairs(VideoHash.frameHashes(df)).count() == 0)
  }

  test("pair generation never goes cartesian: plan joins on the frame " +
    "hash, no BroadcastNestedLoopJoin/CartesianProduct") {
    val plan = VideoHash.containmentPairs(
      VideoHash.frameHashes(Multimodal.plantGifsSeg(ids(10))))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

}
