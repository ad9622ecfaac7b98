package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Relational query corpus covering the reference's operator inventory
  * (SURVEY.md §2): scan/filter/project, 2-phase hash aggregation, all join
  * modes the reference's planner distinguishes (partitioned hash, broadcast,
  * semi, anti, null-aware anti, nested-loop/inequality, cross), window
  * aggregation, grouping sets (rollup/cube), TopK (sort+limit), scalar and
  * correlated subqueries, scalar function surface (CASE/LIKE/substr/concat/
  * date arithmetic/regexp — `/root/reference/testdata/{tpch,tpcds,clickbench}/queries/`).
  *
  * Numeric discipline: every floating aggregate is computed with exact
  * decimal arithmetic (`cast(x as decimal)` before `sum`) and only cast back
  * to double at the end, so Spark and the DuckDB oracle produce bit-identical
  * results regardless of partial-aggregation order (SURVEY.md §7 "Decimal
  * semantics" risk).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Order-insensitive exact sum: cast to decimal, sum, cast back to double. */
  private[queries] def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private[queries] def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  // Oracle-side twin of dsum/davg.
  private[queries] def osum(e: String, scale: Int = 4): String =
    s"cast(sum(cast(($e) as decimal(18,$scale))) as double)"
  private[queries] def oavg(e: String, scale: Int = 4): String =
    s"cast(sum(cast(($e) as decimal(18,$scale))) as double)/count(*)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan -> filter -> partial agg -> shuffle -> final agg -> sort ----
    // TPC-H q1 shape (`testdata/tpch/queries/q1.sql`), the reference's
    // canonical distributed-plan example (docs/learn/02-...md:12-43).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- TopK: ORDER BY ... LIMIT -> TakeOrderedAndProjectExec ----
    "q02_topk" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    }),

    // ---- 3-way shuffle join + agg + topk (TPC-H q3 shape) ----
    "q03_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- left-semi join (EXISTS), TPC-H q4 shape ----
    "q04_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val bigItems = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      o.join(bigItems, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- multi-way join with broadcast dims (TPC-H q5 shape) ----
    "q05_region_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- pure filter + scalar aggregate (TPC-H q6 shape) ----
    "q06_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
                col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    }),

    // ---- join + group by computed key (year) ----
    "q07_volume_by_nation_year" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = broadcast(t(s, dir, "nation"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(col("o_totalprice"), 2).as("volume"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"), col("o_year"))
    }),

    // ---- join + agg + topk on revenue (TPC-H q10 shape) ----
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- distinct aggregation (COUNT DISTINCT; TPC-H q16 / ClickBench q28 shape) ----
    "q16_distinct_suppliers" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      p.join(l, col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
             countDistinct(col("l_orderkey")).as("order_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    }),

    // ---- correlated scalar aggregate via self-join (TPC-H q17 shape).
    // No broadcast hint on avgQty: it is an unbounded per-partkey aggregate
    // over lineitem (~20M rows at SF100) — let AQE pick shuffle vs broadcast
    // from runtime stats instead of forcing a driver OOM at scale. ----
    "q17_small_quantity_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
              count(lit(1))).as("avg_qty"))
      l.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"))
    }),

    // ---- window: rank per group, filter on rank ----
    "q20_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    // ---- window: running sum + lag over event time ----
    "q21_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast(DecimalType(18, 6))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .withColumn("prev_event", lag(col("event_id"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("running_value"), col("prev_event"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- grouping sets: ROLLUP (TPC-DS q27/q36/q67 shape) ----
    "q22_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),

    // ---- grouping sets: CUBE ----
    "q23_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("qty"))
        .orderBy(col("rflag"), col("lstatus"))
    }),

    // ---- union distinct of two filtered scans ----
    "q24_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"), col("c_name"))
        .union(c.filter(col("c_acctbal") > 5000).select(col("c_custkey"), col("c_name")))
        .distinct()
        .orderBy(col("c_custkey"))
    }),

    // ---- anti join (NOT EXISTS): customers without pending orders ----
    "q25_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val pending = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(pending, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- null-aware anti join (NOT IN <subquery>); reference caps these at
    // one task (`normalize_collect_joins.rs:87-91`) — Spark handles the
    // single-copy semantics via BroadcastNestedLoopJoin natively. ----
    "q26_null_aware_anti" -> ((s, dir) => {
      Tables.register(s, dir, "customer", "orders")
      s.sql("""SELECT c_custkey, c_name FROM customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
               ORDER BY c_custkey""")
    }),

    // ---- inequality (range) join: equi key + range predicate ----
    "q27_inequality_join" -> ((s, dir) => {
      val p1 = t(s, dir, "part").select(
        col("p_brand").as("b1"), col("p_size").as("size1"), col("p_retailprice").as("price1"))
      val p2 = t(s, dir, "part").select(
        col("p_brand").as("b2"), col("p_size").as("size2"), col("p_retailprice").as("price2"))
      p1.join(p2, col("b1") === col("b2") && col("size1") < col("size2"))
        .groupBy(col("b1").as("p_brand"))
        .agg(count(lit(1)).as("n_pairs"),
             dsum(col("price2") - col("price1"), 2).as("price_spread"))
        .orderBy(col("p_brand"))
    }),

    // ---- cross join (always broadcast-safe in the reference,
    // `inject_network_boundaries.rs:308-312`) ----
    "q28_cross_join" -> ((s, dir) => {
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- uncorrelated scalar subquery ----
    "q29_scalar_subquery" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val avgPrice = p.agg(
        (sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double") /
         count(lit(1))).as("avg_price"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // ---- group by computed date parts (EXTRACT / date arithmetic) ----
    "q30_datetime_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    // ---- scalar string function surface: CASE / substr / concat / length / LIKE ----
    "q31_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("bucket",
          when(col("p_size") < 10, "S").when(col("p_size") < 25, "M").otherwise("L"))
        .withColumn("tagged", concat(col("p_brand"), lit("|"), col("p_type")))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(length(col("p_name"))).as("total_name_len"),
          sum(when(col("p_name").like("%gear%"), 1).otherwise(0)).as("n_gear"),
          countDistinct(substring(col("p_name"), 1, 4)).as("n_prefixes"),
          countDistinct(col("tagged")).as("n_tags"))
        .orderBy(col("bucket"))
    }),

    // ---- regexp functions over documents (ClickBench REGEXP_REPLACE shape) ----
    "q32_regexp" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("consonant_len"),
          regexp_extract(col("text"), "^[a-z]+", 0).as("first_word"),
          size(split(trim(col("text")), " +")).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- event-time bucketed aggregation (hourly) ----
    "q33_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---- high-cardinality group by + HAVING + topk ----
    "q34_highcard_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_items"))
        .filter(col("sum_qty") > 100)
        .orderBy(col("sum_qty").desc, col("l_orderkey"))
        .limit(100)
    }),

    // ---- q34 with the PartialReduce rule ON (reference's off-by-default
    // partial_reduce_below_network_shuffles): same answer, plan gains a
    // PartialMerge hash aggregate below the exchange. A cloned session
    // scopes the conf to this query; BENCH_DETAIL's q34/q34b delta is the
    // A/B measurement that justifies keeping the default off. ----
    "q34b_highcard_agg_partial_reduce" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.graft.partialReduce", "true")
      t(s2, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_items"))
        .filter(col("sum_qty") > 100)
        .orderBy(col("sum_qty").desc, col("l_orderkey"))
        .limit(100)
    }),

    // ---- q34's aggregation routed through the RUNTIME NDV sizer
    // (reference sampler -> boundary sizing, sampler.rs:38-563): a narrow
    // pre-pass measures key NDV/null%, and because l_orderkey's NDV
    // crosses the (query-lowered) combine threshold the plan takes the
    // high-cardinality path — explicit repartition to an NDV-derived
    // partition count, where map-side combine is worthless and AQE's
    // bytes-only coalescing can't size hash-agg state. Same oracle as
    // q34: sizing must never change the answer. ----
    "q87_ndv_sized_agg" -> ((s, dir) => {
      val (out, decision) = graft.engine.NdvSizing.sizedAggregate(
        t(s, dir, "lineitem"), Seq("l_orderkey"),
        Seq(dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_items")),
        combineNdvThreshold = 1000L, keysPerPartition = 4096L)
      assert(decision.repartitioned, s"expected high-NDV path, got $decision")
      out.filter(col("sum_qty") > 100)
        .orderBy(col("sum_qty").desc, col("l_orderkey"))
        .limit(100)
    }),

    // ---- the join half of the runtime sampler (q87's aggregation twin):
    // sizedEquiJoin measures both sides, sees the filtered orders side
    // fits the broadcast budget by MEASURED row count (not file-size
    // estimate), and hints BROADCAST. Decision asserted so the driver run
    // exercises the measured-broadcast path; oracle is the plain join. ----
    "q92_ndv_sized_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      val (joined, decision) = graft.engine.NdvSizing.sizedEquiJoin(
        t(s, dir, "lineitem"), urgent, Seq("l_orderkey"))
      assert(decision.broadcastRight, s"expected measured broadcast, got $decision")
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
             dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- sessionization via stacked windows (gap > 30 min ⇒ new session) ----
    "q35_sessionize" -> ((s, dir) => {
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("gap_s", unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(byTs))
        .withColumn("brk", when(col("gap_s") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(cum))
        .groupBy(col("user_id"))
        .agg((max(col("session_id")) + 1).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${osum("l_quantity", 2)} AS sum_qty,
         ${osum("l_extendedprice", 2)} AS sum_base_price,
         ${osum("l_extendedprice*(1-l_discount)", 4)} AS sum_disc_price,
         ${osum("l_extendedprice*(1-l_discount)*(1+l_tax)", 6)} AS sum_charge,
         ${oavg("l_quantity", 2)} AS avg_qty,
         ${oavg("l_extendedprice", 2)} AS avg_price,
         ${oavg("l_discount", 4)} AS avg_disc,
         count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""",

    "q03_shipping_priority" ->
      s"""SELECT o_orderkey,
          ${osum("l_extendedprice*(1-l_discount)")} AS revenue,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01'
          AND l_shipdate > TIMESTAMP '1999-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_region_revenue" ->
      s"""SELECT n_name, ${osum("l_extendedprice*(1-l_discount)")} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q06_forecast_revenue" ->
      s"""SELECT ${osum("l_extendedprice*l_discount")} AS revenue FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24""",

    "q07_volume_by_nation_year" ->
      s"""SELECT n_name, cast(extract(year FROM o_orderdate) AS integer) AS o_year,
          ${osum("o_totalprice", 2)} AS volume, count(*) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_year ORDER BY n_name, o_year""",

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, ${osum("l_extendedprice*(1-l_discount)")} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q16_distinct_suppliers" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt,
               count(DISTINCT l_orderkey) AS order_cnt
         FROM part JOIN lineitem ON p_partkey = l_partkey
         GROUP BY p_brand, p_type
         ORDER BY supplier_cnt DESC, p_brand, p_type""",

    "q17_small_quantity_revenue" ->
      s"""SELECT ${osum("l_extendedprice", 2)}/7.0 AS avg_yearly
        FROM lineitem JOIN (
          SELECT l_partkey AS ap_partkey,
                 ${oavg("l_quantity", 2)} AS avg_qty
          FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_partkey
        WHERE l_quantity < 0.5 * avg_qty""",

    "q20_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, cast(rnk AS integer) AS rnk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  rank() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3
         ORDER BY o_custkey, rnk, o_orderkey""",

    "q21_window_running" ->
      """SELECT user_id, event_id,
              cast(sum(cast(value AS decimal(18,6))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_value,
              lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
         FROM events ORDER BY user_id, event_id""",

    "q22_rollup" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
          coalesce(o_orderpriority, 'ALL') AS priority,
          count(*) AS n_orders, ${osum("o_totalprice", 2)} AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""",

    "q23_cube" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag,
          coalesce(l_linestatus, 'ALL') AS lstatus,
          count(*) AS n, ${osum("l_quantity", 2)} AS qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rflag, lstatus""",

    "q24_union" ->
      """SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
         ORDER BY c_custkey""",

    "q25_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
         ORDER BY c_custkey""",

    "q26_null_aware_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
         ORDER BY c_custkey""",

    "q27_inequality_join" ->
      s"""SELECT p1.p_brand, count(*) AS n_pairs,
          ${osum("p2.p_retailprice - p1.p_retailprice", 2)} AS price_spread
        FROM part p1 JOIN part p2
          ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        GROUP BY p1.p_brand ORDER BY p1.p_brand""",

    "q28_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",

    "q29_scalar_subquery" ->
      s"""SELECT p_partkey, p_name, p_retailprice FROM part
        WHERE p_retailprice > (SELECT ${oavg("p_retailprice", 2)} FROM part)
        ORDER BY p_partkey""",

    "q30_datetime_agg" ->
      s"""SELECT cast(extract(year FROM o_orderdate) AS integer) AS o_year,
          cast(extract(month FROM o_orderdate) AS integer) AS o_month,
          count(*) AS n_orders, ${osum("o_totalprice", 2)} AS total
        FROM orders GROUP BY o_year, o_month ORDER BY o_year, o_month""",

    "q31_string_funcs" ->
      """SELECT CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 25 THEN 'M' ELSE 'L' END AS bucket,
              count(*) AS n_parts,
              cast(sum(length(p_name)) AS bigint) AS total_name_len,
              cast(sum(CASE WHEN p_name LIKE '%gear%' THEN 1 ELSE 0 END) AS bigint) AS n_gear,
              count(DISTINCT substr(p_name, 1, 4)) AS n_prefixes,
              count(DISTINCT p_brand || '|' || p_type) AS n_tags
         FROM part GROUP BY bucket ORDER BY bucket""",

    "q32_regexp" ->
      """SELECT doc_id,
              cast(length(regexp_replace(text, '[aeiou]', '', 'g')) AS integer) AS consonant_len,
              regexp_extract(text, '^[a-z]+', 0) AS first_word,
              cast(len(regexp_split_to_array(trim(text), ' +')) AS integer) AS n_tokens
         FROM documents ORDER BY doc_id""",

    "q33_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
          event_type, count(*) AS n, ${osum("value", 6)} AS total_value
        FROM events GROUP BY hour, event_type ORDER BY hour, event_type""",

    "q34_highcard_agg" ->
      s"""SELECT l_orderkey, ${osum("l_quantity", 2)} AS sum_qty, count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey HAVING ${osum("l_quantity", 2)} > 100
        ORDER BY sum_qty DESC, l_orderkey LIMIT 100""",

    // Identical oracle to q34: PartialReduce must never change the answer.
    "q34b_highcard_agg_partial_reduce" ->
      s"""SELECT l_orderkey, ${osum("l_quantity", 2)} AS sum_qty, count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey HAVING ${osum("l_quantity", 2)} > 100
        ORDER BY sum_qty DESC, l_orderkey LIMIT 100""",

    // Identical oracle to q34: NDV-driven sizing must never change the answer.
    "q87_ndv_sized_agg" ->
      s"""SELECT l_orderkey, ${osum("l_quantity", 2)} AS sum_qty, count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey HAVING ${osum("l_quantity", 2)} > 100
        ORDER BY sum_qty DESC, l_orderkey LIMIT 100""",

    "q92_ndv_sized_join" ->
      s"""SELECT o_orderstatus, count(*) AS n_items,
               ${osum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q35_sessionize" ->
      """WITH g AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN date_diff('second', TIMESTAMP '1970-01-01', ts)
                         - lag(date_diff('second', TIMESTAMP '1970-01-01', ts), 1) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                       THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (
           SELECT user_id,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM g)
         SELECT user_id, cast(max(session_id) + 1 AS bigint) AS n_sessions,
                count(*) AS n_events
         FROM s GROUP BY user_id ORDER BY user_id"""
  )
}
