package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case parity with the reference's integration suite:
  *  - executor-side failures must surface at the driver with their cause
  *    (reference `tests/error_propagation.rs:25-41` asserts an error raised
  *    on a worker crosses the wire with its message intact);
  *  - plans whose exchanges carry zero columns must still execute
  *    (reference `tests/empty_columns_between_workers.rs`);
  *  - zero-row relations must flow through shuffles, joins, and aggregates
  *    (the reference's property suite covers empty-batch streams).
  */
class EdgeParitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("executor exception propagates to the driver with its cause message") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x").repartition(4)
      .select(expr("raise_error('planted executor failure')"))
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("planted executor failure")),
      s"cause chain lost the executor error: ${messages(e)}")
  }

  test("zero-column projection flows through an exchange") {
    import spark.implicits._
    val n = (1L to 1000L).toDF("x").repartition(8).select().count()
    assert(n == 1000L)
  }

  test("empty relations flow through shuffle joins and aggregates") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val full = (1L to 50L).map(i => (i, s"r$i")).toDF("k", "w")
    assert(full.join(empty, Seq("k")).count() == 0, "inner join with empty side")
    val left = full.join(empty, Seq("k"), "left_outer")
    assert(left.count() == 50 && left.filter(col("v").isNotNull).count() == 0,
      "left join must preserve rows with null right side")
    val agg = empty.groupBy(col("k")).agg(sum(length(col("v")))).count()
    assert(agg == 0, "aggregate over empty input must yield zero groups")
    val globalAgg = empty.agg(count(lit(1)).as("n"), sum(length(col("v"))).as("s")).head()
    assert(globalAgg.getLong(0) == 0 && globalAgg.isNullAt(1),
      "global aggregate over empty input: count 0, sum null")
  }
}
