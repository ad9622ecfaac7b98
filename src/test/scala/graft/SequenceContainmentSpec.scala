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
}
