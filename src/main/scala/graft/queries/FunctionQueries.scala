package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import Relational.osum

/** Statistical / ordered-set / semi-structured function surface (the
  * reference inherits DataFusion's full aggregate library —
  * `/root/reference/testdata/clickbench/queries/` leans on quantiles and
  * JSON heavily):
  *  - q54: exact interpolated percentiles (Spark `percentile` ==
  *    DuckDB `quantile_cont`).
  *  - q55: moment aggregates (stddev/variance/corr/covar), rounded to
  *    absorb partial-aggregation merge-order noise across engines.
  *  - q56: JSON field extraction over the events.props column.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
          percentile(col("l_quantity"), lit(0.25)).as("qty_p25"))
        .orderBy(col("l_returnflag"))
    }),

    "q55_stats_aggs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(var_samp(col("l_discount")), 8).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"))
        .orderBy(col("l_returnflag"))
    }),

    "q56_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("k")).as("sum_k"),
             max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q54_percentiles" ->
      """SELECT l_returnflag,
              quantile_cont(l_extendedprice, 0.5) AS p50,
              quantile_cont(l_extendedprice, 0.9) AS p90,
              quantile_cont(l_quantity, 0.25) AS qty_p25
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q55_stats_aggs" ->
      """SELECT l_returnflag,
              round(stddev_samp(l_extendedprice), 2) AS sd_price,
              round(var_samp(l_discount), 8) AS var_disc,
              round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
              round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q56_json_extract" ->
      """SELECT event_type, count(*) AS n,
              sum(cast(json_extract_string(props, '$.k') AS bigint)) AS sum_k,
              max(cast(json_extract_string(props, '$.k') AS bigint)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type"""
  )
}
