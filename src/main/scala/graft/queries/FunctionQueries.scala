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
    }),

    // ---- TPC-DS q67 shape: window rank OVER rollup output ----
    "q61_rollup_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val rolled = t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"))
      val w = Window.partitionBy(col("status"))
        .orderBy(col("total").desc, col("priority"))
      rolled.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("status"), col("rk"), col("priority"))
    }),

    // ---- TPC-DS q88 shape: many scalar subqueries as columns of one row ----
    "q62_multi_scalar_columns" -> ((s, dir) => {
      graft.engine.Tables.register(s, dir, "lineitem")
      s.sql("""SELECT
                 (SELECT count(*) FROM lineitem WHERE l_quantity < 10) AS n_q0_10,
                 (SELECT count(*) FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 25) AS n_q10_25,
                 (SELECT count(*) FROM lineitem WHERE l_quantity >= 25 AND l_quantity < 40) AS n_q25_40,
                 (SELECT count(*) FROM lineitem WHERE l_quantity >= 40) AS n_q40_up""")
    }),

    // ---- TPC-DS q70 shape: grouping() hierarchy level + rank partitioned
    // by that level over rollup output ----
    "q64_grouping_hierarchy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val rolled = t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"),
          (grouping(col("o_orderstatus")) + grouping(col("o_orderpriority")))
            .cast("int").as("lochierarchy"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"), col("lochierarchy"), col("g_prio"))
      val w = Window.partitionBy(col("lochierarchy"),
          when(col("g_prio") === 0, col("status")).otherwise(lit(null)))
        .orderBy(col("total").desc, col("priority"))
      rolled.withColumn("rank_within_parent", rank().over(w).cast("int"))
        .select(col("status"), col("priority"), col("total"),
          col("lochierarchy"), col("rank_within_parent"))
        .orderBy(col("lochierarchy").desc, col("status"),
          col("rank_within_parent"), col("priority"))
    }),

    // ---- ClickBench q38-q40 shape: topk page with LIMIT ... OFFSET ----
    "q65_limit_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("o_custkey"))
        .offset(100)
        .limit(10)
    }),

    // ---- remaining window-function family: ntile / lead / first_value ----
    "q66_window_family" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("int").as("quartile"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          first_value(col("o_orderkey")).over(w).as("top_key"))
        .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // ---- multi-COUNT(DISTINCT): Spark plans this via Expand (one
    // duplicated stream per distinct column) — a distinct operator shape
    // from the ClickBench corpus ----
    "q71_multi_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             countDistinct(to_date(col("ts"))).as("n_days"),
             Relational.dsum(col("value"), 6).as("total_value"))
        .orderBy(col("event_type"))
    }),

    // ---- RANGE window frame (value-based, not row-based): trailing
    // 3-day per-user activity over epoch seconds ----
    "q72_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-259200L, 0L)
      t(s, dir, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_3d"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast("double").as("total_3d"))
        .orderBy(col("event_id"))
    }),

    // ---- recursive CTE (Spark 4.x WITH RECURSIVE): calendar-spine
    // generation with zero-filled monthly order counts ----
    "q73_recursive_cte" -> ((s, dir) => {
      graft.engine.Tables.register(s, dir, "orders")
      s.sql("""
        WITH RECURSIVE spine(d, dmax) AS (
          SELECT date_trunc('month', min(o_orderdate)),
                 date_trunc('month', max(o_orderdate)) FROM orders
          UNION ALL
          SELECT d + INTERVAL 1 MONTH, dmax FROM spine WHERE d < dmax
        ),
        monthly AS (
          SELECT date_format(o_orderdate, 'yyyy-MM') AS m, count(*) AS n
          FROM orders GROUP BY m
        )
        SELECT date_format(d, 'yyyy-MM') AS m,
               coalesce(n, 0) AS n_orders
        FROM spine LEFT JOIN monthly ON date_format(d, 'yyyy-MM') = m
        ORDER BY m""")
        .select(col("m"), col("n_orders"))
    }),

    // ---- TPC-DS q51 shape: full outer join of two cumulative windows ----
    "q63_fullouter_cumulative" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val o = t(s, dir, "orders")
      def cumByMonth(status: String, alias: String) = {
        val w = Window.orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.filter(col("o_orderstatus") === status)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("t"))
          .select(col("m"), sum(col("t")).over(w).cast("double").as(alias))
      }
      val f = cumByMonth("F", "cum_f")
      val p = cumByMonth("O", "cum_o")
      f.join(p, Seq("m"), "full_outer")
        .select(col("m"), col("cum_f"), col("cum_o"))
        .orderBy(col("m"))
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
              cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint) AS sum_k,
              max(cast(json_extract_string(props, '$.k') AS bigint)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q61_rollup_window_rank" ->
      """WITH rolled AS (
           SELECT coalesce(o_orderstatus, 'ALL') AS status,
                  coalesce(o_orderpriority, 'ALL') AS priority,
                  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
           FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority))
         SELECT status, priority, total, cast(rk AS integer) AS rk FROM (
           SELECT status, priority, total,
                  rank() OVER (PARTITION BY status
                               ORDER BY total DESC, priority) AS rk
           FROM rolled)
         WHERE rk <= 3 ORDER BY status, rk, priority""",

    "q62_multi_scalar_columns" ->
      """SELECT
           (SELECT count(*) FROM lineitem WHERE l_quantity < 10) AS n_q0_10,
           (SELECT count(*) FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 25) AS n_q10_25,
           (SELECT count(*) FROM lineitem WHERE l_quantity >= 25 AND l_quantity < 40) AS n_q25_40,
           (SELECT count(*) FROM lineitem WHERE l_quantity >= 40) AS n_q40_up""",

    "q64_grouping_hierarchy" ->
      """WITH rolled AS (
           SELECT coalesce(o_orderstatus, 'ALL') AS status,
                  coalesce(o_orderpriority, 'ALL') AS priority,
                  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total,
                  cast(grouping(o_orderstatus) + grouping(o_orderpriority) AS integer) AS lochierarchy,
                  cast(grouping(o_orderpriority) AS integer) AS g_prio
           FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority))
         SELECT status, priority, total, lochierarchy,
                cast(rank() OVER (PARTITION BY lochierarchy,
                       CASE WHEN g_prio = 0 THEN status END
                     ORDER BY total DESC, priority) AS integer) AS rank_within_parent
         FROM rolled
         ORDER BY lochierarchy DESC, status, rank_within_parent, priority""",

    "q65_limit_offset" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
         GROUP BY o_custkey
         ORDER BY n_orders DESC, o_custkey
         LIMIT 10 OFFSET 100""",

    "q66_window_family" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
              cast(ntile(4) OVER w AS integer) AS quartile,
              lead(o_orderkey, 1) OVER w AS next_key,
              first_value(o_orderkey) OVER w AS top_key
         FROM orders WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""",

    "q71_multi_distinct" ->
      s"""SELECT event_type,
              count(DISTINCT user_id) AS n_users,
              count(DISTINCT cast(ts AS date)) AS n_days,
              ${osum("value", 6)} AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q72_range_frame" ->
      """SELECT event_id,
              count(*) OVER w AS n_3d,
              cast(sum(cast(value AS decimal(18,6))) OVER w AS double) AS total_3d
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
                      RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q73_recursive_cte" ->
      """WITH RECURSIVE spine(d, dmax) AS (
           SELECT date_trunc('month', min(o_orderdate)),
                  date_trunc('month', max(o_orderdate)) FROM orders
           UNION ALL
           SELECT d + INTERVAL 1 MONTH, dmax FROM spine WHERE d < dmax
         ),
         monthly AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS m, count(*) AS n
           FROM orders GROUP BY m
         )
         SELECT strftime(d, '%Y-%m') AS m, coalesce(n, 0) AS n_orders
         FROM spine LEFT JOIN monthly ON strftime(d, '%Y-%m') = m
         ORDER BY m""",

    "q63_fullouter_cumulative" ->
      """WITH f AS (
           SELECT m, cast(sum(t) OVER (ORDER BY m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS cum_f
           FROM (SELECT strftime(o_orderdate, '%Y-%m') AS m,
                        sum(cast(o_totalprice AS decimal(18,2))) AS t
                 FROM orders WHERE o_orderstatus = 'F' GROUP BY m)),
         p AS (
           SELECT m, cast(sum(t) OVER (ORDER BY m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS cum_o
           FROM (SELECT strftime(o_orderdate, '%Y-%m') AS m,
                        sum(cast(o_totalprice AS decimal(18,2))) AS t
                 FROM orders WHERE o_orderstatus = 'O' GROUP BY m))
         SELECT coalesce(f.m, p.m) AS m, cum_f, cum_o
         FROM f FULL OUTER JOIN p ON f.m = p.m
         ORDER BY m"""
  )
}
