package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.plans.BroadcastGuard

/** The BroadcastGuard optimizer rule (injected via GraftExtensions) must
  * strip broadcast hints whose build side exceeds the configured estimate,
  * and leave legitimately small hints alone — without ever changing
  * results.
  */
class BroadcastGuardSpec extends AnyFunSuite {
  import SparkTestSession._

  private val key = BroadcastGuard(spark).MaxBytesKey

  test("oversized broadcast hint is stripped; results unchanged") {
    val l = Tables.load(spark, sf01, "lineitem")
    val agg = l.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("q"))
    spark.conf.set(key, "1024") // 1 KiB: the aggregate is way above this
    try {
      val hinted = l.join(broadcast(agg), col("l_partkey") === col("pk"))
      hinted.collect()
      val plan = hinted.queryExecution.optimizedPlan.toString
      assert(!plan.contains("broadcast"),
        s"hint survived the guard:\n$plan")
      val unhinted = l.join(agg, col("l_partkey") === col("pk"))
      assert(hinted.count() == unhinted.count())
    } finally spark.conf.unset(key)
  }

  test("small dimension hint survives the guard") {
    val n = Tables.load(spark, sf01, "nation")
    val c = Tables.load(spark, sf01, "customer")
    val hinted = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    val plan = hinted.queryExecution.optimizedPlan.toString
    assert(plan.contains("broadcast"), s"legitimate hint was stripped:\n$plan")
  }
}
