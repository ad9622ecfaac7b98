package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Temporal
import Relational.osum

/** Time-series join surface over the events table:
  *  - q67: as-of join (each click ↔ the user's most recent prior purchase),
  *    oracled by DuckDB's native `ASOF LEFT JOIN`.
  *  - q68: point-in-interval range join (purchases inside the 7-day window
  *    opened by each signup), oracled by the plain inequality join.
  * Both Spark plans are single-shuffle formulations (see
  * [[graft.operators.Temporal]]); the oracles use the semantics-defining
  * quadratic forms DuckDB can afford at sf0.01.
  */
object TemporalQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))
      Temporal.asofBackward(clicks, purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payloadPrefix = "last_purchase_")
        .select(col("event_id"), col("user_id"),
          col("last_purchase_value"),
          (unix_micros(col("ts")) - unix_micros(col("last_purchase_p_ts")))
            .as("us_since_purchase"))
        .orderBy(col("event_id"))
    }),

    "q74_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))
      Temporal.asofForward(clicks, purchases,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          payloadPrefix = "next_purchase_")
        .select(col("event_id"), col("user_id"),
          col("next_purchase_value"),
          (unix_micros(col("next_purchase_p_ts")) - unix_micros(col("ts")))
            .as("us_until_purchase"))
        .orderBy(col("event_id"))
    }),

    "q68_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val day = (c: org.apache.spark.sql.Column) =>
        datediff(to_date(c), lit("1970-01-01")).cast("long")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"), day(col("ts")).as("d"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), day(col("ts")).as("s0"),
          (day(col("ts")) + 6).as("s1"))
      Temporal.rangeJoinBinned(purchases, signups,
          pointCol = "d", startCol = "s0", endCol = "s1",
          binWidth = 7, keys = Seq("user_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_purchases"),
             Relational.dsum(col("value"), 6).as("total_value"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q67_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS last_purchase_value,
              date_diff('microsecond', r.ts, l.ts) AS us_since_purchase
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",

    "q74_asof_forward" ->
      """SELECT l.event_id, l.user_id, r.value AS next_purchase_value,
              date_diff('microsecond', l.ts, r.ts) AS us_until_purchase
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts <= r.ts
         ORDER BY l.event_id""",

    "q68_range_join" ->
      s"""WITH p AS (SELECT user_id, value,
                datediff('day', DATE '1970-01-01', cast(ts AS date)) AS d
              FROM events WHERE event_type = 'purchase'),
           s AS (SELECT event_id, user_id,
                datediff('day', DATE '1970-01-01', cast(ts AS date)) AS s0
              FROM events WHERE event_type = 'signup')
        SELECT s.event_id, count(*) AS n_purchases,
               ${osum("p.value", 6)} AS total_value
        FROM p JOIN s ON p.user_id = s.user_id AND p.d BETWEEN s.s0 AND s.s0 + 6
        GROUP BY s.event_id ORDER BY s.event_id"""
  )
}
