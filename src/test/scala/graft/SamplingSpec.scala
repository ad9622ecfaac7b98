package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("deterministicSample is stable, nested, and near the target fraction") {
    import spark.implicits._
    val ids = (1L to 10000L).toDF("id")
    val s20a = Sampling.deterministicSample(ids, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    val s20b = Sampling.deterministicSample(ids, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(s20a == s20b, "same fraction must select identical rows")
    val s05 = Sampling.deterministicSample(ids, "id", 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(s05.subsetOf(s20a), "smaller fraction must nest inside larger")
    assert(math.abs(s20a.size / 10000.0 - 0.2) < 0.02,
      s"20% sample selected ${s20a.size}/10000")
    assert(math.abs(s05.size / 10000.0 - 0.05) < 0.01,
      s"5% sample selected ${s05.size}/10000")
  }

  test("bucketHash never overflows: full 32-bit residue range and huge ids") {
    import spark.implicits._
    // Residues near 2^32-1 would overflow Long with a multiplier >= 2^31
    // under ANSI mode; the chosen multiplier keeps the product < 2^63.
    val ids = Seq(0L, 1L, 4294967295L, 4294967296L, Long.MaxValue - 1,
      3474506100L, 4000000000L).toDF("id")
    val hashes = ids.select(Sampling.bucketHash(col("id")).as("h"))
      .collect().map(_.getLong(0))
    assert(hashes.forall(h => h >= 0L && h < 4294967296L),
      s"hash out of [0, 2^32): ${hashes.mkString(",")}")
  }

  test("deterministicSample plan is a narrow filter — no shuffle, no UDF") {
    import spark.implicits._
    val plan = Sampling.deterministicSample((1L to 100L).toDF("id"), "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "sampling must not shuffle")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("mixSources keeps weight-1 sources, drops unlisted, scales the rest") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val mixed = Sampling.mixSources(df, "source", "id",
      Map("src0" -> 1.0, "src1" -> 0.3))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed("src0") == 1000L, "weight 1.0 must keep every row")
    assert(!mixed.contains("src2"), "unlisted source must drop entirely")
    assert(math.abs(mixed("src1") / 1000.0 - 0.3) < 0.05,
      s"src1 kept ${mixed("src1")}/1000 at weight 0.3")
  }

  test("packByBudget: shards are contiguous, bounded, and equal the serial scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1L to 2000L).map(i => (i, 50L + rnd.nextInt(500)))
      .toDF("id", "w")
    val budget = 5000L
    val packed = Sampling.packByBudget(docs, "id", "w", budget, numPartitions = 7)
      .select(col("id"), col("w"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    // Serial oracle: exclusive prefix sum in id order.
    var excl = 0L
    packed.foreach { case (id, w, shard) =>
      assert(shard == (excl / budget).toInt,
        s"id=$id: shard=$shard, serial says ${excl / budget}")
      excl += w
    }
    // Contiguity: shard ids never decrease in id order and start at 0.
    assert(packed.head._3 == 0)
    packed.sliding(2).foreach { case Array((_, _, a), (_, _, b)) =>
      assert(b == a || b == a + 1, s"shard jump $a -> $b")
    }
    // Weight bound: every shard except possibly via one straddling doc
    // stays under budget + max doc weight.
    val maxW = packed.map(_._2).max
    packed.groupBy(_._3).values.foreach { s =>
      assert(s.map(_._2).sum <= budget + maxW)
    }
  }

  test("assignSplits: exhaustive, disjoint, stable, near target fractions") {
    import spark.implicits._
    val ids = (1L to 10000L).toDF("id")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    def run() = Sampling.assignSplits(ids, "id", splits)
      .groupBy(col("split")).count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val counts = run()
    assert(!counts.contains(None), "fractions sum to 1 — every row must land somewhere")
    assert(counts.values.sum == 10000L, "splits must partition the corpus")
    assert(math.abs(counts(Some("train")) / 10000.0 - 0.9) < 0.02)
    assert(math.abs(counts(Some("val")) / 10000.0 - 0.05) < 0.01)
    assert(math.abs(counts(Some("test")) / 10000.0 - 0.05) < 0.01)
    assert(run() == counts, "assignment must be deterministic")
    // Growth stability: a doc's split in a 2x corpus is unchanged (split is
    // a pure function of its own id — no test-set leakage across versions).
    val small = Sampling.assignSplits(ids, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Sampling.assignSplits((1L to 20000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, s) => big(id) == s },
      "corpus growth must never migrate a row between splits")
  }

  test("assignSplits rejects fractions that exceed 1 and leaves remainder null") {
    import spark.implicits._
    val ids = (1L to 100L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, "id", Seq("a" -> 0.7, "b" -> 0.5))
    }
    val partial = Sampling.assignSplits(ids, "id", Seq("a" -> 0.5))
      .filter(col("split").isNull).count()
    assert(partial > 0, "the uncovered remainder must be held out as null")
  }

  test("packByBudget rejects fractional weights and null ids loudly") {
    import spark.implicits._
    val fractional = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "w")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.packByBudget(fractional, "id", "w", 10L)
    }
    assert(e1.getMessage.contains("integral"))
    val withNulls = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
      .toDF("id", "w")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.packByBudget(withNulls, "id", "w", 10L).collect()
    }
    assert(e2.getMessage.contains("null"))
  }

  test("packByBudget survives an id range spanning more than 2^63") {
    import spark.implicits._
    // hi - lo + 1 overflows Long here; the BigInt width + DECIMAL(38,0)
    // bucket arithmetic must still produce the serial prefix-sum answer.
    val docs = Seq(Long.MinValue, Long.MinValue + 3, -1L, 0L, 7L,
      Long.MaxValue - 2, Long.MaxValue).map((_, 100L)).toDF("id", "w")
    val packed = Sampling.packByBudget(docs, "id", "w", 250L, numPartitions = 3)
      .select(col("id"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val expected = packed.map(_._1).zipWithIndex
      .map { case (id, i) => id -> ((i * 100L) / 250L).toInt }
    assert(packed.sameElements(expected),
      s"got ${packed.mkString(",")} expected ${expected.mkString(",")}")
  }

  test("packByBudget partition count does not change the assignment") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, 100L + (i % 37))).toDF("id", "w")
    def run(p: Int) = Sampling.packByBudget(docs, "id", "w", 2500L, p)
      .select(col("id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(3) == run(13), "shard assignment must be layout-independent")
  }

  test("capPerGroup keeps exactly k deterministic rows per group") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    def run() = Sampling.capPerGroup(docs, "grp", "id", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val a = run()
    assert(a.toSet == run().toSet, "cap must be deterministic across runs")
    val byGroup = a.groupBy(_._1)
    assert(byGroup.keySet == Set("g0", "g1", "g2"))
    byGroup.foreach { case (g, rows) =>
      assert(rows.length == 5, s"group $g kept ${rows.length} != 5")
      assert(rows.map(_._3).sorted.sameElements(1 to 5), s"group $g ranks")
    }
    // Brute-force expected survivors: smallest (bucketHash, id) per group.
    def h(id: Long) = ((id % 4294967296L) * 1103515245L) % 4294967296L
    (1L to 100L).groupBy(i => s"g${i % 3}").foreach { case (g, ids) =>
      val expect = ids.sortBy(i => (h(i), i)).take(5).toSet
      assert(byGroup(g).map(_._2).toSet == expect, s"group $g survivor set")
    }
  }

  test("capPerGroup survivors are only evicted by hash-smaller newcomers") {
    import spark.implicits._
    def survivors(n: Long) = Sampling.capPerGroup(
      (1L to n).map(i => (i, s"g${i % 3}")).toDF("id", "grp"), "grp", "id", 5)
      .collect().map(_.getLong(0)).toSet
    val small = survivors(50L)
    val grown = survivors(100L)
    // A row kept after growth that already existed must have been kept
    // before growth — layout/corpus growth can only evict, never admit.
    assert(grown.filter(_ <= 50L).subsetOf(small),
      "growth must not admit previously-rejected rows")
  }

  test("temperature mixtures of an EMPTY corpus are empty, not an error") {
    // Incremental pipelines see empty batches routinely; the p49 class of
    // empty-input crash must not exist here (found by the r10 empty-input
    // sweep: these used to `require(counts.nonEmpty)`).
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long)].toDF("source", "id", "tokens")
    val m = Sampling.temperatureMixture(empty, "source", "id", budget = 100L)
    assert(m.count() == 0 && m.columns.toSeq == Seq("source", "id", "tokens"))
    val w = Sampling.temperatureMixtureWeighted(
      empty, "source", "id", "tokens", budget = 100L)
    assert(w.count() == 0 && w.columns.toSeq == Seq("source", "id", "tokens"))
  }

  test("temperatureMixture flattens a skewed source distribution") {
    import spark.implicits._
    // Natural proportions 100 : 10 : 1.
    val df = ((1L to 1000L).map(i => (i, "src0")) ++
      (1001L to 1100L).map(i => (i, "src1")) ++
      (1101L to 1110L).map(i => (i, "src2"))).toDF("id", "source")
    val kept = Sampling.temperatureMixture(df, "source", "id",
        budget = 300L, alpha = 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // q_i ∝ sqrt(n_i): f0 ≈ 0.2118, f1 ≈ 0.67, f2 = min(1, 2.12) = 1.
    assert(kept("src2") == 10L, s"rarest source must keep all rows: $kept")
    assert(kept("src0") > 120L && kept("src0") < 300L,
      s"src0 must downsample toward ~212: $kept")
    assert(kept("src1").toDouble / 100 > kept("src0").toDouble / 1000,
      s"keep-rate must rise as source size falls: $kept")
    // alpha=1 keeps natural proportions: expected kept ≈ budget * n_i / N.
    val nat = Sampling.temperatureMixture(df, "source", "id",
        budget = 555L, alpha = 1.0)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(nat("src0") - 500.0) < 50,
      s"alpha=1 must keep natural proportions: $nat")
  }

  test("capPerGroup compiles to WindowGroupLimit (map-side bounded cap)") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val plan = Sampling.capPerGroup(docs, "grp", "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push a group-limit below the shuffle:\n$plan")
  }

  test("temperatureMixtureWeighted: few huge docs count as a LARGE source") {
    import spark.implicits._
    // srcBig: 20 docs of 10k chars (200k total); srcSmall: 200 docs of
    // 100 chars (20k total). By DOC count srcSmall is 10x bigger; by
    // weight srcBig is 10x bigger — the weighted mixture must downsample
    // srcBig harder (lower keep fraction) despite its tiny doc count.
    val df = ((1L to 20L).map(i => (i, "srcBig", 10000L)) ++
      (101L to 300L).map(i => (i, "srcSmall", 100L)))
      .toDF("id", "source", "n_chars")
    val kept = Sampling.temperatureMixtureWeighted(df, "source", "id",
        "n_chars", budget = 100000L, alpha = 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // q ∝ sqrt(w): qBig ≈ 0.76, qSmall ≈ 0.24. fBig = 1e5*0.76/200000
    // ≈ 0.38; fSmall = min(1, 1e5*0.24/20000) = min(1, 1.2) -> all 200.
    assert(kept.getOrElse("srcSmall", 0L) == 200L,
      s"small-weight source must keep everything: $kept")
    assert(kept.getOrElse("srcBig", 0L) < 15L,
      s"heavy-weight source must downsample despite few docs: $kept")
    // Zero/negative weights are rejected loudly.
    val bad = Seq((1L, "s", 0L)).toDF("id", "source", "n_chars")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixtureWeighted(bad, "source", "id", "n_chars", 10L)
    }
  }

  test("temperatureMixture rejects null sources loudly (like the weighted form)") {
    import spark.implicits._
    // A null source would inflate the n^alpha denominator yet never match
    // mixSources' equality filter — rows silently vanish and their budget
    // share is never realized. Must fail with the cause instead.
    val withNull = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "source")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(withNull, "source", "id", budget = 2L)
    }
    assert(e.getMessage.contains("null"))
  }

  test("deterministicShuffle: exact permutation, seed-dependent, layout-stable") {
    import spark.implicits._
    val ids = (1L to 997L).toDF("id")
    val pos = Sampling.deterministicShuffle(ids, "id", seed = 7L)
      .select(col("id"), col("shuffle_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Positions are exactly 0..N-1 — a total permutation, no gap, no dup.
    assert(pos.map(_._2).sorted.toSeq == (0L until 997L).toSeq)
    // Not the identity order (the hash actually permutes).
    assert(pos.sortBy(_._2).map(_._1).take(20).toSeq != (1L to 20L).toSeq)
    // A different seed yields a different permutation.
    val pos2 = Sampling.deterministicShuffle(ids, "id", seed = 8L)
      .select(col("id"), col("shuffle_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pos.exists { case (id, p) => pos2(id) != p })
    // Identical under a different physical layout (pure function of data).
    val reparted = Sampling.deterministicShuffle(ids.repartition(13), "id",
        seed = 7L)
      .select(col("id"), col("shuffle_pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pos.forall { case (id, p) => reparted(id) == p },
      "shuffle_pos must not depend on partitioning")
    // No single-partition exchange in the plan (the 100 TB guard).
    val plan = Sampling.deterministicShuffle(ids, "id", seed = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global rank must not serialize through one partition:\n$plan")
  }

  test("per-bucket offsets fold back via broadcast join, not a P-deep when chain") {
    import spark.implicits._
    // At cluster-real partition counts (here P=200) a chained
    // `when(__pid===i, ...)` offset expression is a 200-deep conditional —
    // linear per-row eval and a codegen blowup. The offsets must come in
    // as a broadcast-joined ≤P-row table instead.
    val ids = (1L to 997L).toDF("id")
    val sPlan = Sampling.deterministicShuffle(ids, "id", seed = 7L,
        numPartitions = 200)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("BroadcastHashJoin"),
      s"offset fold-back must be a broadcast join:\n$sPlan")
    assert(!sPlan.contains("CASE WHEN (__pid"),
      "offset fold-back must not be a per-partition conditional chain")
    val docs = (1L to 500L).map(i => (i, 7L)).toDF("id", "w")
    val pPlan = Sampling.packByBudget(docs, "id", "w", 100L,
        numPartitions = 200)
      .queryExecution.executedPlan.toString
    assert(pPlan.contains("BroadcastHashJoin"),
      s"packByBudget offset fold-back must be a broadcast join:\n$pPlan")
  }
}
