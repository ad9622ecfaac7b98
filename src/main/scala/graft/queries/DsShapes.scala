package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables
import Relational.{osum, oavg}

/** TPC-DS-derived shapes the self-authored corpus didn't cover (the
  * reference proves itself on all 99, `tests/tpcds_correctness_test.rs` +
  * `testdata/tpcds/queries/`): correlated-EXISTS chains with a
  * disjunction, a multi-way INTERSECT subquery feeding the main join with
  * a scalar-average HAVING gate, and the zero-filled channel-union rollup
  * report — each adapted to the driver schema. These run through
  * `spark.sql` deliberately: the coverage target is Catalyst's subquery
  * decorrelation / set-op machinery on shapes a DataFrame author rarely
  * writes by hand.
  */
object DsShapes {

  /** TPC-DS q47/q57 family (`testdata/tpcds/queries/q47.sql`, `q57.sql`):
    * monthly grouped sums per dimension group, a running average window over
    * the year partition (the reference's DataFusion-modified variant adds
    * ORDER BY d_moy, making avg_monthly_sales a RUNNING average — mirrored
    * here), and the previous/next month's sum attached to each row. The
    * reference expresses prev/next as a triple self-join on rank()±1; the
    * Spark-first form is lag/lead over the same ordering — identical
    * semantics (rank is unique per partition because the input is grouped by
    * the partition + order keys) with ONE window pass over one shuffle
    * instead of three joins of the aggregate with itself.
    *
    * Float discipline (shared Spark/DuckDB text): monthly sums and their
    * window re-sums stay DECIMAL (exact under any partial-agg or
    * segment-tree order — DuckDB aggregates windows via segment trees, so a
    * double window sum would drift); doubles appear only at the final
    * division and output casts, where IEEE ops on identical inputs are
    * correctly rounded and bit-identical across engines. The average is
    * emitted UNROUNDED: round(x, 4) is where the engines diverge (Spark
    * rounds the exact binary value via BigDecimal HALF_UP; DuckDB scales in
    * floating point first), observed flipping the 4th decimal on real rows.
    */
  private def movingAvgSql(
      dimCols: String, facts: String, dateCol: String, measure: String,
      yr: Int, minDev: Double): String = {
    val y = s"cast(extract(YEAR FROM $dateCol) AS integer)"
    val m = s"cast(extract(MONTH FROM $dateCol) AS integer)"
    s"""WITH v1 AS (
        SELECT $dimCols, $y AS yr, $m AS moy,
               sum(cast(($measure) AS decimal(18,4))) AS sum_sales_dec
        FROM $facts
        WHERE $y = $yr
           OR ($y = ${yr - 1} AND $m = 12)
           OR ($y = ${yr + 1} AND $m = 1)
        GROUP BY $dimCols, $y, $m),
      v2 AS (
        SELECT $dimCols, yr, moy, sum_sales_dec,
               cast(sum(sum_sales_dec) OVER (PARTITION BY $dimCols, yr
                                             ORDER BY moy) AS double)
                 / (count(*) OVER (PARTITION BY $dimCols, yr ORDER BY moy))
                 AS avg_monthly,
               lag(sum_sales_dec) OVER (PARTITION BY $dimCols
                                        ORDER BY yr, moy) AS psum_dec,
               lead(sum_sales_dec) OVER (PARTITION BY $dimCols
                                         ORDER BY yr, moy) AS nsum_dec
        FROM v1)
      SELECT $dimCols, yr, moy,
             cast(sum_sales_dec AS double) AS sum_sales,
             avg_monthly AS avg_monthly_sales,
             cast(psum_dec AS double) AS psum,
             cast(nsum_dec AS double) AS nsum
      FROM v2
      WHERE yr = $yr AND avg_monthly > 0
        AND abs(cast(sum_sales_dec AS double) - avg_monthly) / avg_monthly
              > $minDev
        AND psum_dec IS NOT NULL AND nsum_dec IS NOT NULL
      ORDER BY $dimCols, yr, moy"""
  }

  // q47 analog: two dim attributes (customer nation × market segment) over
  // the orders fact; q57 analog: one dim attribute (supplier nation) over
  // the lineitem fact with revenue as the measure.
  private val q93Sql = movingAvgSql(
    dimCols = "n_name, c_mktsegment",
    facts = """orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey""",
    dateCol = "o_orderdate", measure = "o_totalprice",
    yr = 1995, minDev = 0.1)
  private val q94Sql = movingAvgSql(
    dimCols = "n_name",
    facts = """lineitem JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey""",
    dateCol = "l_shipdate", measure = "l_extendedprice * (1 - l_discount)",
    yr = 1995, minDev = 0.02)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-DS q47 shape: moving-average deviation report, two dims ----
    "q93_moving_avg_sales" -> ((s, dir) => {
      Tables.register(s, dir, "orders", "customer", "nation")
      s.sql(q93Sql)
    }),

    // ---- TPC-DS q57 shape: same family, one dim, lineitem fact ----
    "q94_moving_avg_revenue" -> ((s, dir) => {
      Tables.register(s, dir, "lineitem", "supplier", "nation")
      s.sql(q94Sql)
    }),

    // ---- TPC-DS q10 shape (`testdata/tpcds/queries/q10.sql`): IN-list
    // dim filter + correlated EXISTS AND (EXISTS OR EXISTS) chain, then a
    // demographic-style count rollup. Catalyst decorrelates each EXISTS to
    // a semi/existence join; the disjunction forces ExistenceJoin (flag
    // columns) rather than plain left-semi.
    "q84_exists_chain" -> ((s, dir) => {
      Tables.register(s, dir, "customer", "orders", "lineitem", "nation")
      s.sql("""
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9')
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND extract(YEAR FROM o.o_orderdate) = 1995)
          AND (EXISTS (SELECT 1 FROM orders o2
                       JOIN lineitem l ON l.l_orderkey = o2.o_orderkey
                       WHERE o2.o_custkey = c.c_custkey
                         AND l.l_returnflag = 'R')
               OR EXISTS (SELECT 1 FROM orders o3
                          WHERE o3.o_custkey = c.c_custkey
                            AND o3.o_totalprice > 250000))
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // ---- TPC-DS q14 shape (`testdata/tpcds/queries/q14.sql`): the
    // cross_items CTE is a 3-way INTERSECT of per-"channel" key sets
    // (years stand in for store/catalog/web) gating the main aggregation,
    // with an avg_sales scalar subquery as the HAVING floor.
    "q85_cross_channel_parts" -> ((s, dir) => {
      Tables.register(s, dir, "lineitem", "orders", "part")
      s.sql(s"""
        WITH cross_parts AS (
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1995
          INTERSECT
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1996
          INTERSECT
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1997),
        avg_rev AS (
          SELECT ${oavg("l_extendedprice * (1 - l_discount)")} AS ar
          FROM lineitem)
        SELECT p_brand, count(*) AS n_sales,
               ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
        GROUP BY p_brand
        HAVING ${osum("l_extendedprice * (1 - l_discount)")} >
               2000 * (SELECT ar FROM avg_rev)
        ORDER BY p_brand""")
    }),

    // ---- TPC-DS q5 shape (`testdata/tpcds/queries/q5.sql`): sales and
    // returns unioned with zero-filled placeholder columns into one
    // channel relation, joined to dims, rolled up with a grand total.
    "q86_channel_rollup" -> ((s, dir) => {
      Tables.register(s, dir, "orders", "lineitem", "customer", "nation")
      s.sql(s"""
        WITH sales_returns AS (
          SELECT o_custkey AS custkey, o_totalprice AS sales,
                 cast(0 AS double) AS returns_
          FROM orders
          UNION ALL
          SELECT o.o_custkey, cast(0 AS double), l.l_extendedprice
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R')
        SELECT coalesce(n_name, 'ALL') AS nation, count(*) AS n_events,
               ${osum("sales", 2)} AS sales, ${osum("returns_", 2)} AS returns_
        FROM sales_returns sr
        JOIN customer c ON sr.custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP (n_name)
        ORDER BY nation""")
    }),

    // ---- TPC-H q21 shape (`testdata/tpch/queries/q21.sql`): the hardest
    // decorrelation in the TPC-H suite — EXISTS and NOT EXISTS over the
    // SAME fact table, both correlated to the outer row on one key with a
    // supplier INEQUALITY inside. Adapted to the driver schema (no
    // receipt/commit dates): 'R'-flagged lines stand in for "late".
    // Catalyst plans left-semi + left-anti joins whose condition mixes the
    // equi key with the non-equi suppkey predicate.
    "q88_waiting_supplier" -> ((s, dir) => {
      Tables.register(s, dir, "supplier", "lineitem", "orders", "nation")
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20""")
    }),

    // ---- TPC-DS q88 shape (`testdata/tpcds/queries/q88.sql`): eight
    // uncorrelated single-row COUNT subqueries cross-joined into one wide
    // row — the planner must recognize eight independent scalar aggregates
    // (Spark: one ReusedExchange-able scan each feeding a 1-row
    // BroadcastNestedLoopJoin chain; DuckDB: eight uncorrelated scalars).
    // Hour-of-day buckets over events stand in for the store time slots.
    "q89_hour_buckets" -> ((s, dir) => {
      Tables.register(s, dir, "events")
      val buckets = (0 until 8).map { i =>
        val lo = i * 3; val hi = lo + 2
        s"(SELECT count(*) AS h${lo}_$hi FROM events " +
          s"WHERE extract(HOUR FROM ts) BETWEEN $lo AND $hi " +
          "AND event_type IN ('click','view','purchase')) " + ('a' + i).toChar
      }
      s.sql("SELECT * FROM " + buckets.mkString(", "))
    }),

    // ---- ClickBench q17/q18 shape
    // (`testdata/clickbench/queries/q17.sql`-ish: "SELECT UserID,
    // SearchPhrase, COUNT(*) ... GROUP BY UserID, SearchPhrase ORDER BY
    // COUNT(*) DESC LIMIT 10"): high-cardinality two-key aggregation over
    // a semi-structured column, then a GLOBAL top-k on the aggregate —
    // the web-analytics hot path. The JSON key plays SearchPhrase; ties
    // broken on both keys so the top-10 is layout-deterministic. Spark
    // plans partial agg → key shuffle → TakeOrderedAndProject.
    "q90_clickbench_topk" -> ((s, dir) => {
      Tables.register(s, dir, "events")
      s.sql(s"""
        SELECT user_id, get_json_object(props, '$$.k') AS phrase,
               count(*) AS cnt, ${oavg("value", 2)} AS avg_value
        FROM events
        WHERE event_type <> 'error'
        GROUP BY user_id, get_json_object(props, '$$.k')
        ORDER BY cnt DESC, user_id, phrase
        LIMIT 10""")
    }),

    // ---- TPC-DS q23 shape (`testdata/tpcds/queries/q23.sql`): THREE
    // levels of nesting — the main query is gated by two IN-subqueries,
    // one of which (best_customers) contains a scalar subquery whose
    // operand is itself a grouped subquery (max of per-customer sums).
    // Catalyst: two decorrelated semi-joins over a scalar-subquery plan
    // with its own aggregate below it. Decimal sums throughout so the
    // HAVING threshold can't flip on float summation order.
    "q91_frequent_best" -> ((s, dir) => {
      Tables.register(s, dir, "lineitem", "orders", "customer")
      s.sql(s"""
        WITH frequent_parts AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING count(*) > 4),
        best_customers AS (
          SELECT o_custkey FROM orders
          GROUP BY o_custkey
          HAVING ${osum("o_totalprice", 2)} > 0.5 * (
            SELECT max(total) FROM (
              SELECT ${osum("o_totalprice", 2)} AS total
              FROM orders GROUP BY o_custkey) t))
        SELECT c_mktsegment, count(*) AS n_lines,
               ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
          AND o_custkey IN (SELECT o_custkey FROM best_customers)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    }),

    // ---- time-space two-level aggregation over a filtered dim join
    // (`tests/join.rs:229-250` test_join_time_space_agg_hive): per-key
    // 30-minute-binned MAX inside, AVG of the binned maxima outside —
    // dim × fact with the dim filter pushed below the join, one shuffle
    // per aggregation level. The bin is emitted as epoch seconds (BIGINT)
    // so the bucket arithmetic is engine-neutral; the AVG of arbitrary
    // doubles goes through the exact decimal-sum pattern.
    // UTC DEPENDENCY (ADVICE r09): Spark's unix_timestamp(ts) here and
    // DuckDB's epoch(ts) in the oracle agree only because GraftSession
    // pins spark.sql.session.timeZone=UTC — the fixture's naive-µs ts is
    // cast to TIMESTAMP in session tz (Tables.normalizeEventTs), so a
    // non-UTC override would shift every 1800 s bucket boundary. The pin
    // is part of the engine contract (GraftSession.defaultConf), not an
    // accident of this query. ----
    "q95_time_space_agg" -> ((s, dir) => {
      Tables.register(s, dir, "events", "customer")
      s.sql(s"""
        SELECT env, time_bin,
               ${osum("mx", 6)} / count(*) AS avg_max_value,
               count(*) AS n_bins
        FROM (
          SELECT user_id, c_mktsegment AS env,
                 cast(floor(unix_timestamp(ts) / 1800) * 1800 AS bigint) AS time_bin,
                 max(value) AS mx
          FROM events JOIN customer ON user_id = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY user_id, c_mktsegment,
                   cast(floor(unix_timestamp(ts) / 1800) * 1800 AS bigint)) a
        GROUP BY env, time_bin
        ORDER BY env, time_bin""")
    }),

    // ---- range-predicate EXISTS (`tests/multi_task_collect_join_repros
    // .rs:117-118`): a correlated EXISTS whose predicate is a band, not an
    // equality — Catalyst decorrelates to a BroadcastNestedLoopJoin
    // LeftSemi (the build side is the 100-row supplier, so the loop is
    // |customer| × tiny, not quadratic; exempted in PlanAudit). ----
    "q96_theta_exists" -> ((s, dir) => {
      Tables.register(s, dir, "supplier", "customer")
      s.sql("""
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_acctbal > s.s_acctbal - 50
                        AND c.c_acctbal < s.s_acctbal + 50)
        ORDER BY s_suppkey""")
    })
  )

  val oracles: Map[String, String] = Map(
    // The moving-average SQL is engine-portable by construction (decimal
    // window sums, double only at correctly-rounded ops) — the oracle IS
    // the same text Spark runs.
    "q93_moving_avg_sales" -> q93Sql,
    "q94_moving_avg_revenue" -> q94Sql,

    "q84_exists_chain" ->
      """SELECT c_mktsegment, count(*) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9')
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND extract(YEAR FROM o.o_orderdate) = 1995)
          AND (EXISTS (SELECT 1 FROM orders o2
                       JOIN lineitem l ON l.l_orderkey = o2.o_orderkey
                       WHERE o2.o_custkey = c.c_custkey
                         AND l.l_returnflag = 'R')
               OR EXISTS (SELECT 1 FROM orders o3
                          WHERE o3.o_custkey = c.c_custkey
                            AND o3.o_totalprice > 250000))
        GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q85_cross_channel_parts" ->
      s"""WITH cross_parts AS (
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1995
          INTERSECT
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1996
          INTERSECT
          SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE extract(YEAR FROM o_orderdate) = 1997),
        avg_rev AS (
          SELECT ${oavg("l_extendedprice * (1 - l_discount)")} AS ar
          FROM lineitem)
        SELECT p_brand, count(*) AS n_sales,
               ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
        GROUP BY p_brand
        HAVING ${osum("l_extendedprice * (1 - l_discount)")} >
               2000 * (SELECT ar FROM avg_rev)
        ORDER BY p_brand""",

    "q86_channel_rollup" ->
      s"""WITH sales_returns AS (
          SELECT o_custkey AS custkey, o_totalprice AS sales,
                 cast(0 AS double) AS returns_
          FROM orders
          UNION ALL
          SELECT o.o_custkey, cast(0 AS double), l.l_extendedprice
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R')
        SELECT coalesce(n_name, 'ALL') AS nation, count(*) AS n_events,
               ${osum("sales", 2)} AS sales, ${osum("returns_", 2)} AS returns_
        FROM sales_returns sr
        JOIN customer c ON sr.custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP (n_name)
        ORDER BY nation""",

    "q88_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20""",

    "q89_hour_buckets" -> {
      val buckets = (0 until 8).map { i =>
        val lo = i * 3; val hi = lo + 2
        s"(SELECT count(*) AS h${lo}_$hi FROM events " +
          s"WHERE extract(HOUR FROM ts) BETWEEN $lo AND $hi " +
          "AND event_type IN ('click','view','purchase')) " + ('a' + i).toChar
      }
      "SELECT * FROM " + buckets.mkString(", ")
    },

    "q90_clickbench_topk" ->
      s"""SELECT user_id, json_extract_string(props, '$$.k') AS phrase,
               count(*) AS cnt, ${oavg("value", 2)} AS avg_value
        FROM events
        WHERE event_type <> 'error'
        GROUP BY user_id, json_extract_string(props, '$$.k')
        ORDER BY cnt DESC, user_id, phrase
        LIMIT 10""",

    "q91_frequent_best" ->
      s"""WITH frequent_parts AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING count(*) > 4),
        best_customers AS (
          SELECT o_custkey FROM orders
          GROUP BY o_custkey
          HAVING ${osum("o_totalprice", 2)} > 0.5 * (
            SELECT max(total) FROM (
              SELECT ${osum("o_totalprice", 2)} AS total
              FROM orders GROUP BY o_custkey) t))
        SELECT c_mktsegment, count(*) AS n_lines,
               ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
          AND o_custkey IN (SELECT o_custkey FROM best_customers)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""",

    "q95_time_space_agg" ->
      s"""SELECT env, time_bin,
               ${osum("mx", 6)} / count(*) AS avg_max_value,
               count(*) AS n_bins
        FROM (
          SELECT user_id, c_mktsegment AS env,
                 cast(floor(epoch(ts) / 1800) * 1800 AS bigint) AS time_bin,
                 max(value) AS mx
          FROM events JOIN customer ON user_id = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY user_id, c_mktsegment,
                   cast(floor(epoch(ts) / 1800) * 1800 AS bigint)) a
        GROUP BY env, time_bin
        ORDER BY env, time_bin""",

    "q96_theta_exists" ->
      """SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_acctbal > s.s_acctbal - 50
                        AND c.c_acctbal < s.s_acctbal + 50)
        ORDER BY s_suppkey"""
  )
}