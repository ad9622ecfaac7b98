package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sessions built through GraftSession get every custom Catalyst function
  * via SparkSessionExtensions — no imperative register() call needed.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("injected functions are SQL-callable on a GraftSession build") {
    val sig = spark.sql("SELECT simhash64(array('alpha','beta')) AS s")
      .head().getLong(0)
    val sig2 = spark.sql("SELECT simhash64(array('alpha','beta')) AS s")
      .head().getLong(0)
    assert(sig == sig2, "simhash64 not deterministic")
    val bucket = spark.sql(
      "SELECT hyperplane_lsh(array(cast(0.5 AS float), cast(-1.0 AS float)), 4, 42) AS b")
      .head().getInt(0)
    assert(bucket >= 0 && bucket < 16)
    val asum = spark.sql("SELECT ascii_sum('ab') AS a").head().getLong(0)
    assert(asum == 97L + 98L)
    val mh = spark.sql(
      "SELECT size(minhash_signature(array('a','b','c','d','e','f'), 5, 8)) AS n")
      .head().getInt(0)
    assert(mh == 8)
  }

  test("clusterConf arithmetic: partitions track cores, broadcast tracks memory") {
    import graft.engine.GraftSession
    // A 1000-executor / 8-core / 64 GiB fleet (the 100 TB shape).
    val big = GraftSession.clusterConf(1000, 8, 64)
    assert(big("spark.sql.shuffle.partitions").toLong == 24000L,
      "3 tasks/core over 8000 cores")
    assert(big("spark.sql.autoBroadcastJoinThreshold").toLong == 256L * 1024 * 1024,
      "64 GiB executors afford a 256 MiB build side")
    // A small 8 GiB-executor fleet must get a proportionally smaller
    // broadcast bound, and partitions are capped at a sane ceiling.
    val small = GraftSession.clusterConf(10, 4, 8)
    assert(small("spark.sql.autoBroadcastJoinThreshold").toLong == 32L * 1024 * 1024)
    val huge = GraftSession.clusterConf(100000, 16, 64)
    assert(huge("spark.sql.shuffle.partitions").toLong == 200000L, "ceiling applies")
    // Cluster conf keeps the engine defaults it does not override.
    assert(big("spark.sql.adaptive.enabled") == "true")
  }
}
