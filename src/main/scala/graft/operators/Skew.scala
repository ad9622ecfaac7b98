package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological (one
  * hot key owning a double-digit percentage of a 100 TB fact table — AQE's
  * skew-join split handles moderate skew automatically; salting is the
  * explicit lever when one reducer would still drown).
  */
object Skew {

  /** Salted equi-join of a skewed `large` table against a `small` table:
    * the large side gets a deterministic per-row salt in [0, saltFactor),
    * the small side is replicated once per salt value, and the join runs on
    * (key, salt) — spreading each hot key over `saltFactor` reducers. The
    * result is row-identical to the unsalted join (inner join only: salting
    * replicates the small side, so outer semantics would need de-dup).
    *
    * The salt is a hash of the ENTIRE large row — a pure function of row
    * content, never of runtime position. A positional salt
    * (`monotonically_increasing_id`, `rand`, `spark_partition_id`) is the
    * SPARK-23207 failure class: on task retry recomputed rows change salt,
    * hence reducer, and the join silently drops or duplicates rows.
    * Identical duplicate rows share a salt (slightly less spread, never
    * less correct).
    */
  /** The salt expression itself — a pure function of the row's columns,
    * exposed so tests can pin its determinism and spread directly (the
    * join's OUTPUT is salt-invariant, so a positional-salt regression
    * would be invisible to any result-level check).
    */
  def contentSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(saltFactor.toLong)).cast("int")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = large.withColumn("_salt", contentSalt(large, saltFactor))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N heavy-hitter keys with their share of the table — the
    * diagnostic that decides whether salting is needed at all.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
