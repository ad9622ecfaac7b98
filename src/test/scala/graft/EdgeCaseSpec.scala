package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Degenerate-shape parity with the reference's edge tests
  * (`tests/empty_columns_between_workers.rs`): zero-column rows and empty
  * relations must flow through exchanges, aggregations, and joins without
  * corruption — row COUNTS are data even when no column is.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zero-column rows survive a repartition exchange with exact cardinality") {
    val n = 4321L
    import spark.implicits._
    val zeroCols = (0L until n).toDF("v").select()
    assert(zeroCols.columns.isEmpty, "projection must drop every column")
    // The exchange ships rows that serialize to nothing but their count.
    assert(zeroCols.repartition(8).count() == n)
  }

  test("empty relations through agg, join, union, and window yield empty — never errors") {
    val li = Tables.load(spark, sf001, "lineitem")
    val empty = li.filter(lit(false))
    assert(empty.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity"))).count() == 0)
    // Global agg over empty input is ONE row (SQL semantics), not zero.
    val row = empty.agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .collect()(0)
    assert(row.getLong(0) == 0L && row.isNullAt(1))
    assert(empty.join(li, Seq("l_orderkey")).count() == 0)
    assert(li.join(empty.select(col("l_orderkey").as("k")),
      col("l_orderkey") === col("k"), "left_semi").count() == 0)
    assert(empty.unionByName(empty).count() == 0)
    import org.apache.spark.sql.expressions.Window
    assert(empty.withColumn("rn",
      row_number().over(Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber")))).count() == 0)
  }

  test("all-null key columns aggregate into the single null group") {
    val li = Tables.load(spark, sf001, "lineitem").limit(100)
    val nulled = li.withColumn("k", lit(null).cast("long"))
    val groups = nulled.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
    assert(groups.length == 1 && groups(0).isNullAt(0) && groups(0).getLong(1) == 100L)
  }
}
