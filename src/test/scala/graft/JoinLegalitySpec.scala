package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Join-legality parity matrix, after the reference's collect-join
  * normalization tests (`/root/reference/src/distributed_planner/
  * normalize_collect_joins.rs:16-120`, `tests/multi_task_collect_join_repros.rs`):
  * a broadcast hint on either side of every join type must never change the
  * RESULT — Spark must refuse (or re-plan) illegal build sides, e.g. it must
  * not hash-broadcast the row-emitting side of an outer join. We assert
  * result parity across hint placements, and plan legality for the
  * hash-join cases.
  */
class JoinLegalitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def cust = Tables.load(spark, sf001, "customer")
  private def pendingOrders = Tables.load(spark, sf001, "orders")
    .filter(col("o_orderstatus") === "P")
    .select(col("o_custkey"), col("o_totalprice"))

  private def run(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val joinTypes =
    Seq("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")

  joinTypes.foreach { jt =>
    test(s"$jt join: results identical with no hint / left hint / right hint") {
      val key = col("c_custkey") === col("o_custkey")
      val plain = run(cust.join(pendingOrders, key, jt))
      val hintL = run(broadcast(cust).join(pendingOrders, key, jt))
      val hintR = run(cust.join(broadcast(pendingOrders), key, jt))
      assert(plain.nonEmpty, "vacuous test: join returned nothing")
      assert(hintL == plain, s"$jt: left-broadcast hint changed results")
      assert(hintR == plain, s"$jt: right-broadcast hint changed results")
    }
  }

  test("left_outer with left-broadcast hint: Spark must not build the " +
    "row-emitting (left) side of a BroadcastHashJoin") {
    val df = broadcast(cust).join(pendingOrders, col("c_custkey") === col("o_custkey"), "left_outer")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft")),
      s"illegal BuildLeft broadcast hash join for left_outer:\n$plan")
  }

  test("left_semi with right-broadcast hint uses BroadcastHashJoin BuildRight") {
    val df = cust.join(broadcast(pendingOrders), col("c_custkey") === col("o_custkey"), "left_semi")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"), plan)
  }

  test("null-aware anti join (NOT IN) handles null keys like the oracle: " +
    "any null in the subquery empties the result") {
    import spark.implicits._
    val left = Seq(1, 2, 3).toDF("k")
    val rightWithNull = Seq(Some(1), None).toDF("v")
    left.createOrReplaceTempView("jl_left")
    rightWithNull.createOrReplaceTempView("jl_right")
    val n = spark.sql(
      "SELECT k FROM jl_left WHERE k NOT IN (SELECT v FROM jl_right)").count()
    assert(n == 0, s"NOT IN with null in subquery returned $n rows, want 0")
    val rightNoNull = Seq(1).toDF("v")
    rightNoNull.createOrReplaceTempView("jl_right2")
    val m = spark.sql(
      "SELECT k FROM jl_left WHERE k NOT IN (SELECT v FROM jl_right2)").count()
    assert(m == 2)
  }
}
