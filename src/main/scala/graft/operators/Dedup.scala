package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._
import graft.functions.HashExpressions

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-minimal DataFrame transformation that survives a 1000-executor /
  * 100 TB scale-up:
  *
  *  - exact: one hash-shuffle on the fingerprint (map-side partial agg
  *    applies; the fingerprint is 16 bytes regardless of document size).
  *  - MinHash+LSH: per-row signatures (narrow), then ONE shuffle on
  *    (band, bandHash) for candidate generation — the classic
  *    shingle→minhash→band→bucket-join pipeline. Bucket-size capping guards
  *    against degenerate-key skew (boilerplate text producing million-doc
  *    buckets would otherwise make one reducer quadratic).
  *  - SimHash: 64-bit signature per doc, candidates from 16-bit chunk
  *    banding (hamming ≤ 3 ⇒ some chunk of 4 equal), verify by bit_count.
  */
object Dedup {

  /** Exact dedup on normalized-text fingerprint: keeps the lowest id per
    * group. Returns the surviving rows.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact-dedup group summary: fingerprint, surviving id, group size. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-duplicate candidate pairs with estimated jaccard.
    *
    * @param k             signature length (minhashes)
    * @param r             band width; k/r bands, threshold ≈ (1/(k/r))^(1/r)
    * @param threshold     min estimated jaccard to emit
    * @param maxBucketSize skew guard: LSH buckets larger than this are
    *                      dropped (degenerate boilerplate keys)
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, r: Int = 4, shingleLen: Int = 3,
                   threshold: Double = 0.5,
                   maxBucketSize: Int = 1000): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(wordShingles(col(textCol), shingleLen), k).as("sig"))

    val bands = sigs.select(col("id"), col("sig"),
        posexplode(bandHashes(col("sig"), k, r)).as(Seq("band", "bh")))

    // Skew guard: drop degenerate buckets before the self-join.
    val bucketSizes = bands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > 1 && col("_bsz") <= maxBucketSize)
    val pruned = bands.join(bucketSizes, Seq("band", "bh"))

    val a = pruned.select(col("band"), col("bh"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = pruned.select(col("band"), col("bh"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** Drop every doc that near-dups a lower-id doc (single pass over the pair
    * list — the greedy keep-lowest rule; full transitive closure would need
    * iterative connected components, overkill for dedup-keep-one).
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, r: Int = 4, shingleLen: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    val losers = minhashPairs(df, idCol, textCol, k, r, shingleLen, threshold)
      .select(col("id_b").as("_loser")).distinct()
    df.join(losers, col(idCol) === col("_loser"), "left_anti")
  }

  /** Per-doc 64-bit SimHash signatures. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      HashExpressions.simhash64(tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with hamming ≤ maxHamming, candidates via 16-bit
    * chunk banding (4 chunks; hamming ≤ 3 guarantees a shared chunk).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
    val chunks = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "cv")))
    val a = chunks.select(col("chunk"), col("cv"), col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunks.select(col("chunk"), col("cv"), col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram jaccard similarity for all pairs in (a bounded subset of)
    * the corpus: token-set intersection/union sizes. Quadratic — intended for
    * verification of candidate pairs, not full-corpus sweeps.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   minJaccard: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"), array_distinct(tokens(col(textCol))).as("toks"))
    val a = toks.select(col("id").as("id_a"), col("toks").as("t_a"))
    val b = toks.select(col("id").as("id_b"), col("toks").as("t_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("t_a"), col("t_b"))).cast("double") /
          size(array_union(col("t_a"), col("t_b"))), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
