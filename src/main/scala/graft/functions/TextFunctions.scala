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

  // MinHash signatures and LSH band hashes live in
  // HashExpressions.{MinHashSignature, MinHashBandHashes} (custom Catalyst
  // expressions). A declarative
  // `transform(sequence(0,k-1), i -> array_min(transform(sh, hash(i,s))))`
  // was tried and rejected: higher-order functions are interpreted, and the
  // nested form re-materializes the shingle array k times per row (~100×
  // slower at k=64). Also note an affine family `a_i*h(x)+b_i` WITHOUT
  // modular wraparound is monotonic in h(x) and collapses the signature to
  // the single min-hash shingle — a correctness trap, not just a perf one.
}
