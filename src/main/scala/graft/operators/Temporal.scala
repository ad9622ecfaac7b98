package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks as built-ins (SURVEY.md §7 custom
  * operator preference order: compose existing ops where semantics allow —
  * both of these reduce to one hash shuffle plus narrow work, so no custom
  * physical operator is needed).
  *
  *  - [[asofBackward]]: for every left row, the most recent right row with
  *    the same key and time <= the left row's time (DuckDB/kdb `ASOF JOIN`,
  *    pandas `merge_asof`). Implemented as union + per-key ordered window
  *    (`last(..., ignoreNulls)` running carry-forward): ONE shuffle on the
  *    key, a per-partition sort, no join explosion, no skew amplification —
  *    the merge-join formulation that survives 100 TB (a naive
  *    `l.ts >= r.ts` theta join is quadratic per key).
  *  - [[rangeJoinBinned]]: point-in-interval join via bin quantization:
  *    intervals explode to the bins they cover, points hash to their bin,
  *    and the product becomes a bin equi-join + residual filter. Work scales
  *    with overlap density instead of |points| × |intervals| (the classic
  *    interval-binning rewrite; Spark's own optimizer has no range-join
  *    strategy, so the quadratic BroadcastNestedLoopJoin is what you get
  *    otherwise).
  */
object Temporal {

  /** As-of (backward) join. `right` must contain exactly `keys` + `rightTs`
    * + its payload columns; every payload column lands on the result as
    * `payloadPrefix + name` (null when no right row is at or before the
    * left row's time — left-outer semantics). Ties on time prefer the right
    * row (i.e. a right row AT the left timestamp matches), matching
    * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`. If the right side has
    * MULTIPLE rows at the same (key, ts), the struct-greatest payload wins
    * deterministically (the payload struct participates in the window sort
    * order) — DuckDB/pandas leave this unspecified; here reruns and plan
    * changes can never flip the answer. Payload columns must therefore be
    * orderable types (no maps).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   payloadPrefix: String = "asof_"): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, payloadPrefix, forward = false)

  /** As-of FORWARD join: for every left row, the EARLIEST right row with
    * time >= the left row's time (pandas `merge_asof(direction="forward")`;
    * DuckDB `ASOF JOIN ... ON l.ts <= r.ts`). Same machinery as
    * [[asofBackward]] with the scan direction reversed.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  payloadPrefix: String = "asof_"): DataFrame =
    asofJoin(left, right, keys, leftTs, rightTs, payloadPrefix, forward = true)

  private def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       payloadPrefix: String, forward: Boolean): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(payload.nonEmpty, "right side has no payload columns")
    val payloadType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    // __side orders right (0) before left (1) at equal times so the running
    // carry includes same-instant right rows in either direction.
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__p")): _*)
    val l2 = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    // __p joins the sort order as a deterministic tiebreak: among multiple
    // right rows at one (key, ts) the running `last` lands on the
    // struct-greatest payload, in BOTH scan directions (nulls_first keeps
    // the null-payload left rows ordered before nothing that matters —
    // they only ever read the carry).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t").asc, col("__side").asc,
        col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col("__m").getField(p).as(payloadPrefix + p)): _*)
  }

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose `[startCol, endCol]` (inclusive) contains
    * `pointCol`, optionally also matching on equality `keys`. All three
    * range columns must be integral (map dates/timestamps to day/second
    * numbers first). `binWidth` trades shuffle fan-out (intervals emit
    * `span/binWidth + 1` copies) against residual-filter selectivity;
    * choose it near the typical interval span. When `keys` are present the
    * shuffle key is (keys, bin), so per-key time locality bounds each
    * reducer regardless of corpus size.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth >= 1, s"binWidth=$binWidth must be >= 1")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
