package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table registry over the driver-generated parquet directories.
  *
  * Mirrors the reference's table registration surface
  * (`/root/reference/tests/tpch_correctness_test.rs:166-173` `register_tables`):
  * tables are collections of parquet files registered against a session. In
  * Spark the idiomatic equivalent is `spark.read.parquet` + temp views, with
  * Catalyst handling pushdown/pruning against the files.
  */
object Tables {
  /** Dimension tables small enough to always broadcast at any scale factor. */
  val dims: Seq[String] = Seq("region", "nation", "supplier", "part")
  /** Fact tables that scale with sf and shuffle on their keys. */
  val facts: Seq[String] =
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
  val all: Seq[String] = dims ++ facts

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    // rejects; read nanos as long and truncate to microsecond timestamps
    // (integer `div`, not double division — ns-since-epoch exceeds double's
    // 53-bit mantissa).
    if (name == "events") {
      // The nanosAsLong flag lives in GraftSession.defaultConf; set it
      // here too for sessions not built through GraftSession (idempotent,
      // but documented as session-global).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register selected tables as temp views named after the table —
    * prefer this in query builders over [[registerAll]] so a query does not
    * pay schema reads for the 10-table catalog it doesn't touch.
    */
  def register(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, all: _*)
}
