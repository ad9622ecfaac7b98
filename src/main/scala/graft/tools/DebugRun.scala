package graft.tools

/** Run a single SparkEntry query by name with full stack traces — local
  * debugging aid: `sbt "runMain graft.tools.DebugRun p08_minhash_pairs /root/testdata/sf0.01"`.
  */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.engine.GraftSession.local(8)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(20, false)
    println("ROWS=" + df.count())
    spark.stop()
  }
}
