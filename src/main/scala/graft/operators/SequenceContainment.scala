package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared sub-sequence containment machinery — ONE audited
  * implementation for every temporally-ordered perceptual-hash modality
  * (audio window fingerprints, video frame hashes), the
  * [[BandedHamming]] precedent applied to alignment search: clip A is
  * contained in clip B iff EVERY element hash of A equi-joins an
  * element of B at one fixed offset. The join is on the 64-bit element
  * hash over slim rows — payloads never participate, and the only
  * full-sequence comparison is a count.
  *
  * Contract:
  *  - input: one row per sequence element with (id, pos, n, hash) where
  *    `n` is the element count of that id's sequence.
  *  - output: (inner_id, outer_id, offset_pos, n_matched) where
  *    n_matched = n(inner) — full coverage at offset_pos. Equal-length
  *    mutual matches emit one direction (inner_id < outer_id); strict
  *    sub-sequences emit inner→outer only (n(inner) < n(outer) rules
  *    out the reverse).
  *
  * Scale shape: degenerate hashes (digital silence, flat frames — the
  * [[BandedHamming]] flat-color analog) are size-filtered BEFORE the
  * join with the house default cap, and the filter's window shares the
  * join's hash partitioning (no extra exchange). Candidate volume is
  * bounded at O(rows × cap); the group-by re-shuffles only
  * (inner, outer, offset) slim rows.
  */
object SequenceContainment {

  /** See object doc. `df` columns: idCol, posCol, nCol, hashCol. */
  def pairs(df: DataFrame, idCol: String, posCol: String, nCol: String,
            hashCol: String,
            maxBucketSize: Long = BandedHamming.DefaultMaxBucketSize)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = df.select(col(idCol).as("__id"), col(posCol).as("__pos"),
      col(nCol).as("__n"), col(hashCol).as("__h"))
    val capped = wins
      .withColumn("__bs", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__bs") <= maxBucketSize).drop("__bs")
    val a = capped.select(col("__id").as("inner_id"), col("__pos").as("__wa"),
      col("__n").as("__na"), col("__h"))
    val b = capped.select(col("__id").as("outer_id"), col("__pos").as("__wb"),
      col("__n").as("__nb"), col("__h"))
    a.join(b, Seq("__h"))
      .filter(col("inner_id") =!= col("outer_id"))
      .groupBy(col("inner_id"), col("outer_id"),
        (col("__wb") - col("__wa")).cast("long").as("offset_pos"))
      .agg(count(lit(1)).as("n_matched"),
        max(col("__na")).as("__na"), max(col("__nb")).as("__nb"))
      .filter(col("n_matched") === col("__na") &&
        (col("__na") < col("__nb") ||
          (col("__na") === col("__nb") &&
            col("inner_id") < col("outer_id"))))
      .select(col("inner_id"), col("outer_id"), col("offset_pos"),
        col("n_matched"))
  }
}
