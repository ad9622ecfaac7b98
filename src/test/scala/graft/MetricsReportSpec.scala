package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.MetricsReport

class MetricsReportSpec extends AnyFunSuite {
  import SparkTestSession._

  test("task metrics rollup sees the scan records and the agg shuffle") {
    val reports = MetricsReport.collect(
      SparkEntry.queries("q01_pricing_summary")(spark, sf001))
    assert(reports.nonEmpty, "no stages observed")
    assert(reports.map(_.recordsRead).sum >= 6000,
      s"scan records missing: $reports")
    assert(reports.exists(_.shuffleWriteBytes > 0),
      s"no shuffle write observed across stages: $reports")
    assert(reports.map(_.numTasks).sum > 0)
    // Latency percentiles (the reference's DDSketch P50/P95 metric types):
    // ordered, bounded by the max, and max <= the stage's total run time.
    reports.foreach { r =>
      assert(r.p50Ms <= r.p95Ms && r.p95Ms <= r.maxMs,
        s"percentiles out of order: $r")
      assert(r.maxMs <= r.runTimeMs, s"max task time exceeds stage total: $r")
    }
  }

  // The reference renders Aggregated OR PerTask
  // (task_metrics_rewriter.rs:20-38); both formats must come from one run
  // of a multi-stage query, and the per-task rows must reconcile with the
  // stage rollup.
  test("per-task format lists task rows that reconcile with the stage rollup") {
    val (stages, tasks) = MetricsReport.collectWithTasks(
      SparkEntry.queries("q03_shipping_priority")(spark, sf001))
    assert(stages.nonEmpty && tasks.nonEmpty)
    val byStage = tasks.groupBy(_.stageId)
    // Every task row belongs to an observed stage, respects the retention
    // cap, and no task outlasts its stage's observed max.
    byStage.foreach { case (sid, ts) =>
      val st = stages.find(_.stageId == sid)
      assert(st.isDefined, s"task rows for unobserved stage $sid")
      assert(ts.length <= 128 && ts.length <= st.get.numTasks)
      assert(ts.forall(_.durationMs <= st.get.maxMs),
        s"task duration exceeds stage max in stage $sid")
      // Straggler ordering: rows arrive slowest-first within the stage.
      assert(ts.map(_.durationMs) == ts.map(_.durationMs).sortBy(-(_: Long)),
        s"per-task rows not straggler-ordered in stage $sid")
    }
    // When a stage has fewer tasks than the cap, every task is retained —
    // the sums must reconcile exactly with the rollup.
    stages.filter(s => s.numTasks <= 128 && byStage.contains(s.stageId))
      .foreach { s =>
        val ts = byStage(s.stageId)
        assert(ts.length == s.numTasks,
          s"stage ${s.stageId}: ${ts.length} task rows vs ${s.numTasks} tasks")
        assert(ts.map(_.recordsRead).sum == s.recordsRead,
          s"stage ${s.stageId}: task recordsRead don't sum to the rollup")
      }
    // Both formats render from the same collection.
    assert(MetricsReport.render(stages).nonEmpty)
    assert(MetricsReport.renderPerTask(tasks).linesIterator.size == tasks.size + 1)
  }
}
