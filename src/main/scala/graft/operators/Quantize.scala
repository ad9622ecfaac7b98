package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for large-scale vector stores: per-vector int8
  * scalar quantization (the faiss `SQ8`-style baseline). At 100 TB of
  * embeddings the 4× shrink (float32 → int8 + two doubles per vector) is
  * what makes the ANN index fit a cluster's aggregate memory; the decode
  * is two flops per dimension, cheap enough to fold into any scoring
  * kernel.
  *
  * Per-VECTOR ranges (not corpus-global) keep the operator a pure, narrow,
  * shuffle-free function of each row — reproducible on any cluster layout
  * and exactly recomputable by a SQL oracle. Everything is standard
  * higher-order-function algebra over `array` columns: native Catalyst
  * expressions, no UDFs, no state.
  */
object Quantize {

  /** Quantize `vecCol` (array<float|double>) to int8 codes. Output columns:
    * `qv` (array<int> in [-128, 127]), `lo` (per-vector min), `scale`
    * (range/255, 1.0 for constant vectors so decode is exact). Decode is
    * `(q + 128) * scale + lo`.
    */
  def int8(df: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), v.as("v"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("hi", array_max(col("v")))
      .withColumn("scale",
        when(col("hi") > col("lo"), (col("hi") - col("lo")) / 255.0)
          .otherwise(lit(1.0)))
      .withColumn("qv", transform(col("v"),
        x => (round((x - col("lo")) / col("scale"), 0).cast("int") - 128)))
      .drop("hi")
  }

  /** Per-dimension decode of an [[int8]]-quantized vector. */
  def decode(qv: Column, lo: Column, scale: Column): Column =
    transform(qv, q => (q.cast("double") + 128.0) * scale + lo)

  /** Reconstruction-error summary per vector: worst absolute error across
    * dimensions (bounded by scale/2 for a correct rounding quantizer — the
    * property a spec can assert) plus code-range stats. Scalar outputs so
    * the oracle comparison is exact.
    */
  def int8Stats(df: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val q = int8(df, idCol, vecCol)
    q.select(col(idCol),
      array_min(col("qv")).as("qmin"),
      array_max(col("qv")).as("qmax"),
      aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("qsum"),
      round(
        aggregate(
          zip_with(col("v"), decode(col("qv"), col("lo"), col("scale")),
            (x, d) => abs(x - d)),
          lit(0.0), (acc, e) => greatest(acc, e)), 6).as("max_abs_err"))
  }
}
