package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions, regexp, hashing) — no UDFs — so the
  * expressions stay inside whole-stage codegen and distribute trivially:
  * per-row narrow transformations with no shuffle.
  */
object TextFunctions {

  /** Whitespace-normalized, lower-cased text. */
  def normText(c: Column): Column =
    trim(lower(regexp_replace(c, "\\s+", " ")))

  /** Word tokens of normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword token count: alpha runs, digit runs, single symbols. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Document fingerprint: hash of whitespace-normalized lower-cased text.
    * Exact-dedup key robust to spacing/case differences.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Stopword ratio against a small english marker set. */
  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val n = tokenCount(c)
    when(n > 0,
      length(regexp_replace(normText(c), " ", "")).cast("double") / n)
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: length prior + stopword prior +
    * token-shape prior. Deterministic double arithmetic (same result on any
    * engine evaluating IEEE doubles in this expression order).
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val shapeScore = {
      val m = meanTokenLen(c)
      when(m >= 3.0 && m <= 10.0, 1.0).otherwise(0.5)
    }
    round(lenScore * 0.4 + stopScore * 0.3 + shapeScore * 0.3, 6)
  }

  /** Rule-based language ID over marker words (n-gram heuristic class).
    * Deliberately SQL-expressible so the DuckDB oracle can mirror it.
    */
  def langId(c: Column): Column = {
    val t = concat(lit(" "), normText(c), lit(" "))
    when(t.contains(" the ") || t.contains(" and "), "en")
      .when(t.contains(" le ") || t.contains(" la "), "fr")
      .when(t.contains(" der ") || t.contains(" und "), "de")
      .when(t.contains(" el ") || t.contains(" los "), "es")
      .otherwise("unknown")
  }

  /** Word n-gram shingles (space-joined) of normalized text; empty array when
    * the document has fewer than `n` tokens.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature (k affine transforms over one xxhash64 base hash, min
    * per transform). Returns array<long> of length k. Per-row, shuffle-free;
    * the standard minwise family `h_i(x) = a_i*h(x)+b_i` with wrapping 64-bit
    * arithmetic.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    // Base hash masked to 31 bits and multipliers kept small so the affine
    // transform can't overflow a long (Spark 4 runs ANSI mode: wrapping
    // arithmetic throws instead of wrapping).
    val base = transform(shingles, s => xxhash64(s).bitwiseAND(lit(0x7FFFFFFFL)))
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(base,
        h => h * (i.cast("long") * 2L + 1L) + i.cast("long") * lit(2654435769L))))
  }

  /** LSH band hashes over a minhash signature: k/r bands of r rows each,
    * hashed to a long. Near-dup candidates = docs sharing any (band, hash).
    */
  def bandHashes(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"k=$k not divisible by band width r=$r")
    transform(sequence(lit(0), lit(k / r - 1)),
      b => xxhash64(slice(sig, b * r + 1, lit(r))))
  }
}
