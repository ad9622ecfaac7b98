package graft

import org.scalatest.funsuite.AnyFunSuite

/** p150's size-derived probe-panel strategy (r19): at fixture scale the
  * panel rides a single coalesced partition (cheapest correct shape for
  * a KB panel); at corpus scale it is LANDED to per-invocation parquet
  * so the planner sees real stats and no partition grows with N. Both
  * branches must compute identical rows — and each must carry its
  * declared physical shape.
  */
class PanelStrategySpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(land: Boolean) = {
    spark.conf.set("spark.graft.p150.land", land.toString)
    try {
      val df = SparkEntry.queries("p150_hard_negatives")(spark, sf01)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.unset("spark.graft.p150.land")
  }

  test("fixture branch (land=false): coalesced panel, no landed scan; " +
    "scale branch (land=true): panel read from parquet with real stats; " +
    "identical results") {
    val (fixturePlan, fixtureRows) = run(land = false)
    assert(fixturePlan.contains("Coalesce"),
      s"fixture branch must coalesce the panel:\n$fixturePlan")
    val (scalePlan, scaleRows) = run(land = true)
    // The landed panel appears as a parquet scan of the p150panel sink;
    // with real (tiny) stats the broadcast hint survives BroadcastGuard,
    // so the theta join plans as a broadcast nested loop, not a
    // cartesian over a single-partition panel.
    assert(scalePlan.contains("p150panel") ||
      scalePlan.contains("BroadcastNestedLoopJoin"),
      s"scale branch must read the landed panel:\n$scalePlan")
    assert(!scalePlan.contains("Coalesce (1)"),
      s"scale branch must not carry a single-partition panel:\n$scalePlan")
    assert(fixtureRows == scaleRows,
      "panel strategy changed the query's rows")
  }
}
