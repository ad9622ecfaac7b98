package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SequenceContainment

/** Cap/coverage semantics of the shared alignment join, at the
  * synthetic (id, pos, n, hash) level: a clip carrying a few globally
  * common elements must STILL be findable as contained (coverage counts
  * cap-surviving elements, not the original length — the r16 recall
  * cliff), while pure-degenerate clips stay excluded by the
  * surviving-fraction floor (the clique-blowup case the cap exists
  * for).
  */
class SequenceContainmentSpec extends AnyFunSuite {
  import SparkTestSession._

  /** (id, pos, n, hash) rows for one clip from an explicit hash list. */
  private def clip(id: Long, hashes: Seq[Long]): Seq[(Long, Int, Int, Long)] =
    hashes.zipWithIndex.map { case (h, p) => (id, p, hashes.length, h) }

  private def df(rows: Seq[(Long, Int, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "pos", "n", "hash")
  }

  private def pairs(rows: Seq[(Long, Int, Int, Long)], cap: Long) =
    SequenceContainment.pairs(df(rows), "id", "pos", "n", "hash",
        maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq

  // One popular hash (digital silence / a black frame): planted into
  // enough clips that its bucket blows past the cap.
  private val Popular = 999L

  test("a clip with ONE popular element inside an otherwise-unique " +
    "contained sequence is still reported contained under the cap " +
    "(n_matched = surviving count), and uncapped reports full length") {
    // inner 1: 12 windows, position 5 is the popular hash; outer 2
    // contains inner's full hash sequence at offset 3.
    val innerH = (0 until 12).map(p => if (p == 5) Popular else 100L + p)
    val outerH = (0 until 3).map(p => 200L + p) ++ innerH ++
      (0 until 5).map(p => 300L + p)
    // 30 filler clips of 2 popular windows each: bucket(Popular) = 62.
    val filler = (0 until 30).flatMap(i =>
      clip(1000L + i, Seq(Popular, Popular)))
    val rows = clip(1L, innerH) ++ clip(2L, outerH) ++ filler
    val capped = pairs(rows, cap = 50)
    assert(capped == Seq((1L, 2L, 3L, 11L)), s"capped: $capped")
    val uncapped = pairs(rows, cap = Long.MaxValue)
    // uncapped: the planted containment at full length, plus whatever
    // mutual containments the popular-only filler clips mint (the
    // blowup the cap prevents) — the planted pair must be among them.
    assert(uncapped.contains((1L, 2L, 3L, 12L)), s"uncapped: $uncapped")
  }

  test("pure-degenerate clips (every element capped) are excluded: " +
    "zero surviving elements can never claim containment") {
    val outerH = (0 until 20).map(p => 400L + p)
    val filler = (0 until 30).flatMap(i =>
      clip(1000L + i, Seq(Popular, Popular)))
    val rows = clip(2L, outerH) ++ filler
    assert(pairs(rows, cap = 50).isEmpty)
  }

  test("the surviving-fraction floor excludes clips that lose MOST of " +
    "their elements to the cap (a rump match is not containment)") {
    // inner: 10 windows, 8 popular + 2 unique — surviving 2 < ceil(5).
    // outer contains both unique hashes (and more), so without the
    // floor the 2-window rump would fully cover.
    val innerH = Seq(700L, 701L) ++ Seq.fill(8)(Popular)
    val outerH = (0 until 3).map(p => 800L + p) ++ Seq(700L, 701L) ++
      (0 until 10).map(p => 900L + p)
    val filler = (0 until 30).flatMap(i =>
      clip(1000L + i, Seq(Popular, Popular)))
    val rows = clip(1L, innerH) ++ clip(2L, outerH) ++ filler
    assert(pairs(rows, cap = 50).isEmpty)
    // at a floor the clip satisfies (2/10 surviving, frac 0.2) the
    // rump IS reported — the floor, not the cap, is what excluded it.
    val loose = SequenceContainment.pairs(df(rows), "id", "pos", "n",
        "hash", maxBucketSize = 50, minSurvivingFrac = 0.2)
      .collect()
    assert(loose.length == 1 && loose(0).getLong(3) == 2L)
  }

  test("keep-the-container survivors: a chain A ⊂ B ⊂ C keeps only C " +
    "(transitive closure emits (A,C) directly), standalone clips " +
    "survive, equal-length dups keep the larger id") {
    // C = 10 windows; B = C's windows [2,7); A = B's windows [1,4)
    val cH = (0 until 10).map(p => 100L + p)
    val bH = cH.slice(2, 7)
    val aH = bH.slice(1, 4)
    val dupH = (0 until 4).map(p => 500L + p)
    val rows = clip(1L, aH) ++ clip(2L, bH) ++ clip(3L, cH) ++
      clip(4L, (0 until 6).map(p => 700L + p)) ++ // standalone
      clip(5L, dupH) ++ clip(6L, dupH) // equal-length mutual
    val p = SequenceContainment.pairs(df(rows), "id", "pos", "n", "hash",
      maxBucketSize = Long.MaxValue)
    // transitive closure: (1,2), (1,3), (2,3) all emitted
    val inner2outer = p.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)).subsetOf(inner2outer))
    val surv = SequenceContainment.survivors(
        df(rows).select(col("id")).distinct(), p)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(surv == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true,
      5L -> false, 6L -> true))
  }

  test("incrementalPairs emits ONLY cross-side pairs, both directions, " +
    "and never re-joins the corpus (or batch) against itself") {
    // corpus: container 1 with segment 2 (a corpus-corpus containment
    // that must NOT be emitted); batch: an excerpt of 1 and a clip
    // containing 2 entirely.
    val c1 = (0 until 8).map(p => 100L + p)
    val c2 = c1.slice(3, 6)
    val bIn = c1.slice(2, 7)  // batch clip inside corpus 1
    val bOut = (0 until 2).map(p => 900L + p) ++ c2 ++
      (0 until 2).map(p => 950L + p) // batch clip CONTAINING corpus 2
    val corpus = df(clip(1L, c1) ++ clip(2L, c2))
    val batch = df(clip(100L, bIn) ++ clip(101L, bOut))
    val got = SequenceContainment.incrementalPairs(corpus, batch,
        "id", "pos", "n", "hash", maxBucketSize = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    // batch 100 ⊂ corpus 1 at offset 2; corpus 2 ⊂ batch 100 at 1;
    // corpus 2 ⊂ batch 101 at 2 — and NOT (2 ⊂ 1), NOT batch-batch
    assert(got == Seq((2L, 100L, 1L), (2L, 101L, 2L), (100L, 1L, 2L)),
      s"got $got")
  }

  test("incremental cap is SYMMETRIC: a pathological batch flooding one " +
    "hash caps the corpus side of that bucket too") {
    val corpus = df(clip(1L, Seq(100L, Popular, 101L, 102L)))
    val flood = (0 until 60).flatMap(i =>
      clip(2000L + i, Seq(Popular, Popular)))
    // a batch excerpt of corpus 1 that includes the flooded hash
    val batch = df(flood ++ clip(100L, Seq(Popular, 101L, 102L)))
    val got = SequenceContainment.incrementalPairs(corpus, batch,
        "id", "pos", "n", "hash", maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // the Popular windows are capped on BOTH sides; batch 100's two
    // surviving windows still fully align into corpus 1 at offset 1
    assert(got == Seq((100L, 1L, 1L, 2L)), s"got $got")
  }

  test("shareUpstream regimes (r19): the default materializes the capped " +
    "windows once (checkpoint scan in the plan); shareUpstream=false " +
    "keeps the un-truncated lineage — and both compute the same pairs") {
    val rows = clip(1L, (0 until 8).map(p => 100L + p)) ++
      clip(2L, (100L + 3 to 100L + 5)) // 2 ⊂ 1 at offset 3
    def plan(share: Boolean) =
      SequenceContainment.pairs(df(rows), "id", "pos", "n", "hash",
          maxBucketSize = Long.MaxValue, shareUpstream = share)
        .queryExecution.optimizedPlan.toString
    // default (decode-heavy callers): one materialized evaluation shared
    // by all three consumers — the plan reads a checkpointed RDD scan.
    assert(plan(share = true).contains("LogicalRDD"),
      s"shared plan must read the checkpointed rows:\n${plan(share = true)}")
    // cheap-upstream callers (p112): no materialization barrier at all.
    assert(!plan(share = false).contains("LogicalRDD"),
      s"unshared plan must keep raw lineage:\n${plan(share = false)}")
    def got(share: Boolean) =
      SequenceContainment.pairs(df(rows), "id", "pos", "n", "hash",
          maxBucketSize = Long.MaxValue, shareUpstream = share)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
    assert(got(share = true) == got(share = false) &&
      got(share = false) == Seq((2L, 1L, 3L, 3L)))
  }

  test("broadcast gating (r17 verdict): no FORCED hint in the containment " +
    "plans (AQE gates on measured runtime sizes instead), and the " +
    "explicit measured gate helper works for cheap-upstream callers") {
    import graft.engine.NdvSizing
    val wins = clip(1L, (0 until 6).map(p => 100L + p)) ++
      clip(2L, (0 until 3).map(p => 102L + p)) // 2 ⊂ 1 at offset 2
    // The measuredBroadcast helper (used where the upstream is cheap,
    // e.g. Dedup.propagateDeletes): a measured 2-row aggregate is
    // hinted under the default budget, and NOT under a 1-byte one.
    val agg = df(wins).groupBy(col("id")).agg(count(lit(1)).as("ns"))
    // Hints only survive as part of a join relation — pin them there.
    def joinPlan(side: org.apache.spark.sql.DataFrame): String =
      df(wins).join(side, Seq("id")).queryExecution.optimizedPlan.toString
    val (hinted, nRows) = NdvSizing.measuredBroadcast(agg)
    assert(nRows == 2L)
    assert(joinPlan(hinted).contains("broadcast"),
      "under-budget side lost its hint")
    val (unhinted, _) = NdvSizing.measuredBroadcast(agg, broadcastBytes = 1L)
    assert(!joinPlan(unhinted).contains("broadcast"),
      "past-budget side still carries a hint")
    // SequenceContainment itself must carry NO forced hint: a hint
    // rests on Catalyst's estimate of an aggregate, and a driver-
    // measured count re-runs the expensive upstream (the 6.6× p112
    // regression) — the unhinted join lets AQE convert from TRUE
    // runtime sizes with zero extra passes.
    val got = pairs(wins, cap = Long.MaxValue)
    assert(got == Seq((2L, 1L, 2L, 3L)), s"got $got")
    val plan = SequenceContainment.pairs(df(wins), "id", "pos", "n", "hash",
        maxBucketSize = Long.MaxValue)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("broadcast"),
      s"containment must not force a broadcast hint:\n$plan")
    val splan = SequenceContainment.survivors(
        df(wins).select(col("id")).distinct(),
        SequenceContainment.pairs(df(wins), "id", "pos", "n", "hash",
          maxBucketSize = Long.MaxValue))
      .queryExecution.optimizedPlan.toString
    assert(!splan.contains("broadcast"),
      s"survivors must not force a broadcast hint:\n$splan")
  }
}
