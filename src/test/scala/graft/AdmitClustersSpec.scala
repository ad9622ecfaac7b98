package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BandedHamming, Dedup}

/** Incremental cluster admission (Dedup.admitToClusters): bounded-work
  * batch admission into settled min-label clusters must equal
  * from-scratch CC over the combined graph — including the case the
  * fixture corpora can't mint naturally: a batch item BRIDGING two
  * settled corpus clusters, forcing a cluster merge and a corpus-side
  * relabel.
  */
class AdmitClustersSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sigsOf(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, h) =>
      (id, h, ((h >>> 0) & 0xffffL).toInt, ((h >>> 16) & 0xffffL).toInt,
        ((h >>> 32) & 0xffffL).toInt, ((h >>> 48) & 0xffffL).toInt, true)
    }.toDF("media_id", "fhash", "b0", "b1", "b2", "b3", "decoded")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** From-scratch truth: CC over corpus+batch with all-pairs edges. */
  private def fromScratch(all: DataFrame): Map[Long, Long] =
    labelsOf(Dedup.connectedComponents(
      all.select(col("media_id").as("id")),
      BandedHamming.pairs(all, "media_id", "fhash",
        maxBucketSize = Long.MaxValue)))

  private def admit(corpus: DataFrame, batch: DataFrame): Map[Long, Long] = {
    val corpusLabels = Dedup.connectedComponents(
      corpus.select(col("media_id").as("id")),
      BandedHamming.pairs(corpus, "media_id", "fhash",
        maxBucketSize = Long.MaxValue))
    labelsOf(Dedup.admitToClusters(
      corpusLabels,
      batch.select(col("media_id").as("id")),
      BandedHamming.incrementalPairs(corpus, batch, "media_id", "fhash",
          maxBucketSize = Long.MaxValue)
        .select(col("corpus_id"), col("batch_id")),
      BandedHamming.pairs(batch, "media_id", "fhash",
          maxBucketSize = Long.MaxValue)
        .select(col("id_a"), col("id_b"))))
  }

  test("a batch item bridging TWO settled corpus clusters merges them: " +
    "incremental labels equal from-scratch CC, and the higher cluster " +
    "RELABELS") {
    // Corpus: cluster {0, 2} at hash 0 (distance 0), cluster {1} at a
    // 6-bit-distant hash — too far from 0 directly (6 > radius 3).
    val h0 = 0L
    val h1 = 0x3FL // bits 0..5
    val corpus = sigsOf(Seq(0L -> h0, 2L -> h0, 1L -> h1))
    // Batch item 100 sits 3 bits from BOTH (bits 0..2): the bridge.
    val batch = sigsOf(Seq(100L -> 0x07L))
    val inc = admit(corpus, batch)
    val full = fromScratch(corpus.unionByName(batch))
    assert(inc == full, s"incremental $inc != from-scratch $full")
    assert(inc == Map(0L -> 0L, 2L -> 0L, 1L -> 0L, 100L -> 0L),
      "bridge must merge {0,2} and {1} under min label 0, " +
        "relabeling corpus cluster 1")
  }

  test("fresh unlinked batch items mint new singleton clusters; " +
    "untouched corpus clusters keep their labels") {
    val corpus = sigsOf(Seq(0L -> 0L, 2L -> 0L, 5L -> 0xFF00L))
    val batch = sigsOf(Seq(
      100L -> 0xF0F0F0F0L, // fresh: near nothing
      101L -> 0xFF01L)) // joins 5's cluster (distance 1)
    val inc = admit(corpus, batch)
    val full = fromScratch(corpus.unionByName(batch))
    assert(inc == full)
    assert(inc == Map(0L -> 0L, 2L -> 0L, 5L -> 5L, 100L -> 100L,
      101L -> 5L))
  }

  test("batch-internal pair between two fresh items forms one new " +
    "cluster under the lower batch id") {
    val corpus = sigsOf(Seq(0L -> 0L))
    val batch = sigsOf(Seq(100L -> 0xAAAA0000L, 101L -> 0xAAAA0001L))
    val inc = admit(corpus, batch)
    assert(inc == fromScratch(corpus.unionByName(batch)))
    assert(inc == Map(0L -> 0L, 100L -> 100L, 101L -> 100L))
  }

  test("a batch chain linking a fresh item to a corpus cluster through " +
    "another batch item propagates the corpus label (multi-hop merge)") {
    // corpus {0}; batch 100 within 3 of 0; batch 101 within 3 of 100 but
    // 6 from 0 — reachable only through the chain.
    val corpus = sigsOf(Seq(0L -> 0L))
    val batch = sigsOf(Seq(100L -> 0x07L, 101L -> 0x3FL))
    val inc = admit(corpus, batch)
    assert(inc == fromScratch(corpus.unionByName(batch)))
    assert(inc == Map(0L -> 0L, 100L -> 0L, 101L -> 0L))
  }

  test("randomized property: admission equals from-scratch CC on 30 " +
    "seeded corpora") {
    val rnd = new scala.util.Random(421)
    (1 to 30).foreach { trial =>
      // Small hash space (10 distinct values spread >= 8 bits apart in
      // pairs) so clusters, bridges, and fresh items all occur.
      val centers = Array.tabulate(6)(i => (i.toLong * 0x1111L) << 3)
      def jitter(h: Long) = { // flip up to 1 low bit: stays in-radius
        if (rnd.nextBoolean()) h ^ (1L << rnd.nextInt(2)) else h
      }
      val corpus = sigsOf((0L until 12L).map(id =>
        id -> jitter(centers(rnd.nextInt(centers.length)))))
      val batch = sigsOf((100L until 108L).map(id =>
        id -> jitter(centers(rnd.nextInt(centers.length)))))
      val inc = admit(corpus, batch)
      val full = fromScratch(corpus.unionByName(batch))
      assert(inc == full, s"trial $trial: $inc != $full")
    }
  }
}
