package graft

import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession

/** One shared local SparkSession for the whole forked test JVM — Spark
  * session startup is ~5s, so per-suite sessions would dominate test time.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[8]", "graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}
