package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Executor-failure propagation parity with the reference's
  * `tests/error_propagation.rs:25-41`: an error raised inside a task on a
  * worker must surface on the driver with its original message intact (not
  * a generic stage-failure shell), and the session must remain fully
  * usable afterwards — one poisoned query cannot wedge the engine.
  */
class ErrorPropagationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("executor-side error reaches the driver with its message; session survives") {
    val df = Tables.load(spark, sf001, "lineitem")
      .select(raise_error(concat(lit("poisoned row "),
        col("l_orderkey").cast("string"))).as("boom"))
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("poisoned row")),
      s"original executor message lost: ${messages(e).take(3)}")
    // Engine must stay healthy: the same session runs a real query next.
    assert(SparkEntry.queries("q01_pricing_summary")(spark, sf001).count() > 0)
  }

  test("mid-stage failure in one partition fails the whole query, not a subset") {
    import spark.implicits._
    // Poison exactly one partition: results must never be partial.
    val df = (0L until 1000L).toDF("v").repartition(8)
      .select(when(col("v") === 777L,
        raise_error(lit("partition poison"))).otherwise(col("v")).as("v"))
    val e = intercept[Exception] { df.agg(sum(col("v"))).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("partition poison")))
  }
}
