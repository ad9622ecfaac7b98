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
}
