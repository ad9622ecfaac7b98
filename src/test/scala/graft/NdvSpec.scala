package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** NDV / null-fraction estimation — the statistics the reference's
  * `SamplerExec` measures at stage heads to size downstream stages
  * (`/root/reference/src/execution_plans/sampler.rs:38-563`). Spark's
  * HyperLogLog++ `approx_count_distinct` is the engine-side primitive;
  * its error must stay within the documented rsd for planning to trust it.
  */
class NdvSpec extends AnyFunSuite {
  import SparkTestSession._

  test("approx_count_distinct within 5% of exact NDV on real key columns") {
    val l = Tables.load(spark, sf01, "lineitem")
    val row = l.agg(
      countDistinct(col("l_orderkey")).as("exact_ok"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_ok"),
      countDistinct(col("l_partkey")).as("exact_pk"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_pk")).head()
    def relErr(exact: Long, approx: Long) = math.abs(approx - exact).toDouble / exact
    assert(relErr(row.getLong(0), row.getLong(1)) < 0.05,
      s"orderkey NDV ${row.getLong(1)} vs exact ${row.getLong(0)}")
    assert(relErr(row.getLong(2), row.getLong(3)) < 0.05,
      s"partkey NDV ${row.getLong(3)} vs exact ${row.getLong(2)}")
  }

  test("null fraction measurable in one pass alongside NDV") {
    import spark.implicits._
    val df = Seq(Some(1), None, Some(2), None, Some(1)).toDF("v")
    val r = df.agg(
      (count(lit(1)) - count(col("v"))).as("nulls"),
      count(lit(1)).as("total")).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
  }
}
