package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Repo analogs of the last two reference feature tests without one:
  *
  *  - `tests/introspection.rs` (SHOW COLUMNS routed through the
  *    distributed engine over its registered tables): Spark's catalog
  *    commands must see the engine's views — fixture binds AND suite
  *    adapter binds — with the right schemas.
  *  - `tests/local_connections.rs` (stages small enough for one machine
  *    are co-located, avoiding network jumps): Spark's runtime analog is
  *    AQE's local shuffle read — when a join converts to broadcast at
  *    runtime, the probe side's shuffle is read LOCALLY
  *    (`AQEShuffleRead local`) instead of through the exchange, which is
  *    exactly "skip the network jump when the data is already here".
  */
class IntrospectionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("SHOW COLUMNS / DESCRIBE see engine-registered fixture and suite views") {
    Tables.register(spark, sf001, "customer")
    val cols = spark.sql("SHOW COLUMNS FROM customer")
      .collect().map(_.getString(0)).toSet
    assert(cols == Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"), cols)
    val desc = spark.sql("DESCRIBE TABLE customer")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("c_custkey") == "bigint", desc)
    // Suite adapter views are first-class catalog citizens too.
    graft.queries.DsPort.register(spark, sf001)
    val dsCols = spark.sql("SHOW COLUMNS FROM store_sales")
      .collect().map(_.getString(0))
    assert(dsCols.contains("ss_item_sk"), dsCols.mkString(","))
    val tables = spark.sql("SHOW TABLES")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains("store_sales") && tables.contains("customer"),
      tables.mkString(","))
  }

  test("AQE localizes the shuffle read when a join converts to broadcast " +
      "at runtime (co-location analog)") {
    import spark.implicits._
    val confs = Seq(
      // Static planning must NOT broadcast (else there is no shuffle to
      // localize); the runtime threshold then converts the small build
      // side, and the probe side's shuffle becomes a local read.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1048576")
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.range(20000)
        .select(col("id") % 100 as "k", col("id") as "payload")
      val dim = spark.range(100).select(col("id") as "k",
        concat(lit("d"), col("id")) as "name")
      val df = fact.join(dim, Seq("k")).groupBy(col("name"))
        .agg(count(lit(1)).as("n"))
      val rows = df.collect()
      assert(rows.length == 100)
      assert(rows.map(_.getLong(1)).sum == 20000L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"runtime broadcast conversion expected:\n${plan.take(1200)}")
      assert(plan.contains("AQEShuffleRead local"),
        s"probe-side shuffle should be read locally (no network jump):\n${
          plan.take(1200)}")
    } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }
}
