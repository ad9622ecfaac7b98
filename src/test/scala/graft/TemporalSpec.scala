package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("asofBackward picks the most recent right row at or before each left time") {
    import spark.implicits._
    val left = Seq((1, 5L, "a"), (1, 10L, "b"), (1, 20L, "c"), (2, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 5L, 100.0), (1, 15L, 200.0), (2, 8L, 300.0))
      .toDF("k", "t", "px")
    val out = Temporal.asofBackward(left, right, Seq("k"), "t", "t")
      .select(col("tag"), col("asof_px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") == Some(100.0), "tie on time must match the right row")
    assert(out("b") == Some(100.0), "t=10 sees px@5, not the later px@15")
    assert(out("c") == Some(200.0), "t=20 carries forward px@15")
    assert(out("d") == None, "no right row at or before t=7 for k=2")
  }

  test("asofBackward equals the per-row argmax formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i => (rnd.nextInt(10), rnd.nextInt(1000).toLong, i))
      .toDF("k", "t", "id")
    // Dedupe right-side (k, t): which of several same-instant right rows
    // wins is unspecified in BOTH asof and the argmax oracle, so keeping
    // duplicates would force a tolerance window that could mask real
    // off-by-one/carry bugs; with unique (k, t) the comparison is exact.
    val right = (1 to 200).map(i => (rnd.nextInt(10), rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "t", "v")
      .dropDuplicates("k", "t")
    val fast = Temporal.asofBackward(left, right, Seq("k"), "t", "t")
      .select(col("id"), col("asof_v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    // Oracle: theta join + max-ts pick (quadratic; fine at this size).
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .groupBy(col("id"))
      .agg(max_by(col("r.v"), col("r.t")).as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(fast.keySet == naive.keySet)
    fast.keys.foreach { k =>
      assert(fast(k) == naive(k),
        s"row $k: asof=${fast(k)} argmax=${naive(k)}")
    }
  }

  test("asofForward picks the earliest right row at or after each left time") {
    import spark.implicits._
    val left = Seq((1, 5L, "a"), (1, 10L, "b"), (1, 20L, "c")).toDF("k", "t", "tag")
    val right = Seq((1, 5L, 100.0), (1, 15L, 200.0)).toDF("k", "t", "px")
    val out = Temporal.asofForward(left, right, Seq("k"), "t", "t")
      .select(col("tag"), col("asof_px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") == Some(100.0), "tie at t=5 must match the same-instant right row")
    assert(out("b") == Some(200.0), "t=10 looks ahead to px@15")
    assert(out("c") == None, "no right row at or after t=20")
  }

  test("duplicate right rows at one (key, ts) resolve deterministically to the greatest payload") {
    import spark.implicits._
    val left = Seq((1, 10L, "a")).toDF("k", "t", "tag")
    // Three right rows at the SAME (k, t): the struct-greatest payload must
    // win, on every run, in both directions.
    val right = Seq((1, 10L, 5.0), (1, 10L, 9.0), (1, 10L, 7.0)).toDF("k", "t", "px")
    (1 to 3).foreach { _ =>
      val b = Temporal.asofBackward(left, right, Seq("k"), "t", "t")
        .select(col("asof_px")).head().getDouble(0)
      assert(b == 9.0, s"backward tie-break picked $b, expected max payload 9.0")
      val f = Temporal.asofForward(left, right, Seq("k"), "t", "t")
        .select(col("asof_px")).head().getDouble(0)
      assert(f == 9.0, s"forward tie-break picked $f, expected max payload 9.0")
    }
  }

  test("asofBackward plan: one shuffle on the key, no join operator at all") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i % 5, i.toLong, i)).toDF("k", "t", "id")
    val right = (1 to 50).map(i => (i % 5, i.toLong, i.toDouble)).toDF("k", "t", "v")
    val plan = Temporal.asofBackward(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "asof must not cartesian")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      "asof is union+window, not a join")
    assert(plan.contains("Window"), "expected the carry-forward window")
  }

  test("rangeJoinBinned equals the naive inequality join, with no cartesian in the plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(i => (rnd.nextInt(8), rnd.nextInt(300).toLong, i))
      .toDF("k", "d", "pid")
    val ivals = (1 to 60).map { i =>
      val s = rnd.nextInt(300).toLong
      (rnd.nextInt(8), s, s + rnd.nextInt(20), i)
    }.toDF("k", "s0", "s1", "iid")
    val binned = Temporal.rangeJoinBinned(points, ivals, "d", "s0", "s1",
        binWidth = 10, keys = Seq("k"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val naive = points.as("p").join(ivals.as("i"),
        col("p.k") === col("i.k") &&
          col("p.d") >= col("i.s0") && col("p.d") <= col("i.s1"))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(binned.sameElements(naive),
      s"binned=${binned.length} naive=${naive.length}")
    val plan = Temporal.rangeJoinBinned(points, ivals, "d", "s0", "s1",
      binWidth = 10, keys = Seq("k")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "range join must stay an equi-join on (key, bin)")
  }

  test("rangeJoinBinned covers intervals that span multiple bins") {
    import spark.implicits._
    val points = Seq((0L, 1), (9L, 2), (10L, 3), (25L, 4)).toDF("d", "pid")
    val ivals = Seq((0L, 25L, 1)).toDF("s0", "s1", "iid")
    val got = Temporal.rangeJoinBinned(points, ivals, "d", "s0", "s1", binWidth = 10)
      .select(col("pid")).collect().map(_.getInt(0)).sorted
    assert(got.sameElements(Array(1, 2, 3, 4)))
  }
}
