package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.{HashExpressions, TextFunctions => TF}
import graft.operators.{Dedup, Multimodal, Similarity}

/** LLM-training-data pipeline query corpus (beyond the reference's own
  * surface, mandated by BASELINE.json): dedup family, similarity search,
  * text analysis, multimodal binary plumbing.
  *
  * Oracle policy: everything deterministic and SQL-expressible gets a DuckDB
  * oracle (exact dedup, jaccard, text stats, quality, lang-id, brute-force
  * cosine top-k, multimodal byte stats). Sketch-hash operators whose hash
  * functions can't be reproduced in DuckDB SQL (minhash/simhash/LSH buckets)
  * are rows-only here and verified for semantic properties in ScalaTest
  * (planted near-dups found, LSH recall vs brute force).
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // DuckDB twin of TF.normText.
  private val oNorm = "trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val oToks = s"string_split($oNorm, ' ')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: group summary on normalized fingerprint ----
    "p01_dedup_exact_groups" -> ((s, dir) => {
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")
        .orderBy(col("fp"))
    }),

    // ---- exact dedup: surviving rows (keep lowest id per fingerprint) ----
    "p02_dedup_exact_rows" -> ((s, dir) => {
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- text statistics: token counts (whitespace + BPE-ish), lengths ----
    "p03_text_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        length(TF.normText(col("text"))).as("n_chars_norm"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        round(TF.meanTokenLen(col("text")), 6).as("mean_token_len"))
        .orderBy(col("doc_id"))
    }),

    // ---- heuristic quality scoring ----
    "p04_quality_score" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        TF.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // ---- rule-based language ID + distribution ----
    "p05_lang_id" -> ((s, dir) => {
      docs(s, dir)
        .select(TF.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))
    }),

    // ---- multimodal binary plumbing: byte length + content hash ----
    "p06_multimodal_bytes" -> ((s, dir) => {
      Multimodal.fromDocuments(docs(s, dir))
        .select(col("media_id"), col("modality"),
          length(col("data")).as("byte_len"),
          md5(col("data")).as("content_md5"),
          col("meta.format").as("format"))
        .orderBy(col("media_id"))
    }),

    // ---- n-gram jaccard near-dup pairs (exact, bounded subset) ----
    "p07_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(
        docs(s, dir).filter(col("doc_id") < 100), "doc_id", "text",
        minJaccard = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- MinHash+LSH near-dup candidate pairs (rows-only oracle) ----
    "p08_minhash_pairs" -> ((s, dir) => {
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
        k = 32, r = 4, shingleLen = 2, threshold = 0.25)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- SimHash signatures via custom Catalyst expression (rows-only) ----
    "p09_simhash_sigs" -> ((s, dir) => {
      HashExpressions.register(s)
      Dedup.simhashSignatures(docs(s, dir), "doc_id", "text")
        .orderBy(col("id"))
    }),

    // ---- brute-force cosine top-k (exact ANN baseline) ----
    "p10_embedding_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(e, q, k = 10)
        .orderBy(col("query_id"), col("rk"))
    }),

    // ---- LSH bucket histogram (the ANN scale path; rows-only) ----
    "p11_embedding_lsh_buckets" -> ((s, dir) => {
      HashExpressions.register(s)
      Similarity.bucketed(emb(s, dir), nBits = 8)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // ---- ANN top-k via LSH bucket join (rows-only; recall vs p10 in spec) ----
    "p12_ann_lsh_topk" -> ((s, dir) => {
      HashExpressions.register(s)
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopK(e, q, k = 10, nBits = 6)
        .orderBy(col("query_id"), col("rk"))
    })
  )

  val oracles: Map[String, String] = Map(
    "p01_dedup_exact_groups" ->
      s"""SELECT md5($oNorm) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY fp ORDER BY fp""",

    "p02_dedup_exact_rows" ->
      s"""SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars,
                 row_number() OVER (PARTITION BY md5($oNorm) ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1 ORDER BY doc_id""",

    "p03_text_stats" ->
      s"""SELECT doc_id,
          cast(length($oNorm) AS integer) AS n_chars_norm,
          cast(len($oToks) AS integer) AS n_tokens,
          cast(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS integer) AS n_bpe_tokens,
          round(CASE WHEN len($oToks) > 0
                THEN length(regexp_replace($oNorm, ' ', '', 'g'))::double / len($oToks)
                ELSE 0.0 END, 6) AS mean_token_len
        FROM documents ORDER BY doc_id""",

    "p04_quality_score" ->
      s"""SELECT doc_id,
          round(
            least(len($oToks)::double / 100.0, 1.0) * 0.4 +
            least((CASE WHEN len($oToks) > 0
                   THEN len(list_filter($oToks, t -> t IN
                     ('the','a','an','and','or','of','to','in','is','it')))::double / len($oToks)
                   ELSE 0.0 END) * 5.0, 1.0) * 0.3 +
            (CASE WHEN (CASE WHEN len($oToks) > 0
                        THEN length(regexp_replace($oNorm, ' ', '', 'g'))::double / len($oToks)
                        ELSE 0.0 END) BETWEEN 3.0 AND 10.0
                  THEN 1.0 ELSE 0.5 END) * 0.3, 6) AS quality
        FROM documents ORDER BY doc_id""",

    "p05_lang_id" ->
      s"""SELECT CASE
          WHEN ' ' || $oNorm || ' ' LIKE '% the %' OR ' ' || $oNorm || ' ' LIKE '% and %' THEN 'en'
          WHEN ' ' || $oNorm || ' ' LIKE '% le %' OR ' ' || $oNorm || ' ' LIKE '% la %' THEN 'fr'
          WHEN ' ' || $oNorm || ' ' LIKE '% der %' OR ' ' || $oNorm || ' ' LIKE '% und %' THEN 'de'
          WHEN ' ' || $oNorm || ' ' LIKE '% el %' OR ' ' || $oNorm || ' ' LIKE '% los %' THEN 'es'
          ELSE 'unknown' END AS lang_pred, count(*) AS n
        FROM documents GROUP BY lang_pred ORDER BY lang_pred""",

    "p06_multimodal_bytes" ->
      """SELECT doc_id AS media_id, 'image' AS modality,
              cast(strlen(text) AS integer) AS byte_len,
              md5(text) AS content_md5,
              'fake/raw' AS format
         FROM documents ORDER BY media_id""",

    "p07_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($oToks) AS toks
                   FROM documents WHERE doc_id < 100)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.toks, b.toks))::double /
                     len(list_distinct(a.toks || b.toks)), 6) AS jaccard
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE round(len(list_intersect(a.toks, b.toks))::double /
                    len(list_distinct(a.toks || b.toks)), 6) >= 0.5
        ORDER BY id_a, id_b"""
  )
}
