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
  }
}
