package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Bucketing, Tables}

/** Bucketed co-located joins: after bucketing both sides on the join key,
  * the join must run WITHOUT any shuffle exchange — the write-once
  * pre-shuffle that makes repeated fact-fact joins affordable at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val orders = Tables.load(spark, sf001, "orders")
    val lineitem = Tables.load(spark, sf001, "lineitem")
    Bucketing.writeBucketed(
      orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // Result parity with the plain (shuffling) join.
      val expected = orders.select("o_orderkey", "o_totalprice")
        .join(lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
