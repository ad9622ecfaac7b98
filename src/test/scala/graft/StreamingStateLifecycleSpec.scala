package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams.Event

/** Stateful-plan lifecycle parity with the reference's
  * `tests/stateful_execution_plan.rs` / `tests/stateful_data_cleanup.rs`:
  * executor-side operator state must (a) persist across a query restart
  * from the same checkpoint — the state store is recovered, not rebuilt —
  * and (b) be EVICTED once the watermark closes a window, so state size
  * tracks the open-window set, not the stream's full history (the property
  * that makes an unbounded stream runnable on bounded memory at 100 TB).
  * Both are observed through public surface only: the memory sink's
  * results and `StreamingQueryProgress.stateOperators.numRowsTotal`.
  */
class StreamingStateLifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(t), user, typ, v)

  test("state survives a stop/restart from the same checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val ckpt = sys.props("java.io.tmpdir") +
      s"/graft_state_restart_${java.util.UUID.randomUUID()}"
    def startQuery(name: String) =
      input.toDF().groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .start()

    val q1 = startQuery("lifecycle_a")
    input.addData(ev(1, "2025-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2025-01-01 10:01:00", 2, "click", 1.0))
    q1.processAllAvailable()
    q1.stop()
    assert(!spark.streams.active.map(_.id).contains(q1.id),
      "stopped query still listed active")

    // Restart against the SAME checkpoint: the per-key counts must resume
    // from recovered state (user 1 -> 2), not restart from zero.
    val q2 = startQuery("lifecycle_b")
    try {
      input.addData(ev(3, "2025-01-01 10:02:00", 1, "view", 1.0))
      q2.processAllAvailable()
      val counts = spark.table("lifecycle_b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts == Map(1L -> 2L, 2L -> 1L),
        s"state not recovered across restart: $counts")
      assert(q2.id == q1.id, "restart from a checkpoint must keep the query id")
    } finally q2.stop()
  }

  test("watermark eviction: closed-window state is dropped, not retained") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("lifecycle_evict")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // Three windows opened far apart; each later batch moves the
      // watermark past the previous window, finalizing + evicting it.
      input.addData(ev(1, "2025-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2025-01-01 10:05:00", 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(ev(3, "2025-01-01 12:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(ev(4, "2025-01-01 14:00:00", 1, "click", 1.0))
      q.processAllAvailable()
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators.head.numRowsTotal)
      assert(stateRows.nonEmpty, "no state-operator progress reported")
      // History opened 3 windows; retained state at the end must be the
      // OPEN set only (the 14:00 window — earlier ones are past watermark),
      // proving eviction rather than accumulation.
      assert(stateRows.last <= 2,
        s"state rows ${stateRows.last} suggest closed windows were retained " +
          s"(history: $stateRows)")
      assert(stateRows.max >= stateRows.last,
        "state never shrank across watermark advances")
      // Finalized windows reached the sink exactly once each.
      val emitted = spark.table("lifecycle_evict").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getLong(1))).toMap
      assert(emitted("2025-01-01 10:00:00.0") == 2L,
        s"finalized 10:00 window wrong/missing: $emitted")
    } finally q.stop()
  }
}
