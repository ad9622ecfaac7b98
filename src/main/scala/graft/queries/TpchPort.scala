package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Tables

/** Verbatim port of the reference's TPC-H query corpus — all 22 files under
  * `/root/reference/testdata/tpch/queries/q1.sql`–`q22.sql` — as `h01`–`h22`,
  * run as-written through `spark.sql` over registered views (the exact thing
  * a reference user migrating their SQL would do), with each body string
  * doubling as its own DuckDB oracle. This converts the corpus's
  * derived-SHAPE parity (q01–q47 analogs) into verbatim-CORPUS parity:
  * insurance against query shapes the self-derivation process
  * systematically misses.
  *
  * The driver fixture is TPC-H-ish, not TPC-H, so five mechanical
  * adaptation classes apply — each at the view/constant level, never the
  * query structure:
  *
  *  1. **Missing columns synthesized closed-form** in adapter views shared
  *     verbatim between engines (engine-neutral SQL: `make_date`, `%`,
  *     `||`, `CASE` — identical values in Spark and DuckDB):
  *     `l_commitdate`/`l_receiptdate`/`l_shipmode`/`l_shipinstruct`,
  *     `o_comment`/`o_shippriority`/`o_clerk`, `c_phone`/`c_address`/
  *     `c_comment`, `s_address`/`s_phone`/`s_comment`, `p_mfgr`/
  *     `p_container`. The missing `partsupp` table derives its key set
  *     from the distinct `(l_partkey, l_suppkey)` pairs with
  *     integer-valued closed-form `ps_availqty`/`ps_supplycost`
  *     (integer-valued doubles sum exactly, so q11/q20's unwrapped
  *     aggregates stay cross-engine deterministic).
  *  2. **Money aggregates use the decimal-cast pattern**
  *     (`cast(sum(cast(x as decimal(18,4))) as double)`, the proven
  *     [[Relational.dsum]]/osum twins, identical text in both engines):
  *     the fixture degraded TPC-H's `DECIMAL(15,2)` money columns to
  *     `double`, and a raw double sum is summation-order-dependent.
  *     Integer-valued sums (`l_quantity`, counts) stay verbatim.
  *  3. **Domain substitutions** where fixture values differ: nation names
  *     are `NATION_0..24` (GERMANY→NATION_7, FRANCE→NATION_6,
  *     BRAZIL→NATION_1 ∈ AMERICA, CANADA→NATION_11, SAUDI
  *     ARABIA→NATION_4); `p_type` is single-word (ECONOMY/MEDIUM/SMALL/
  *     STANDARD/LARGE/PROMO); `p_name` is adjective+noun (`forest%`→
  *     `red%`, `%green%`→`%red%`); date windows shift into the fixture's
  *     1995–2001 span (region names, segments, brands, priorities match
  *     real TPC-H and stay verbatim).
  *  4. **Output `DATE` columns cast to string** (q3/q18's `o_orderdate`) —
  *     raw DATE compares as different types across the two engines'
  *     parquet/pandas paths; ISO-format strings sort and compare
  *     identically.
  *  5. **q15's `create view`/`drop view` lifecycle becomes a CTE** (the
  *     statement-splitting is a harness concern, not a query shape), and
  *     `extract(year ...)`/count-of-int outputs get an explicit
  *     integer/bigint cast (Spark returns int32/int64 where DuckDB
  *     returns int64/hugeint).
  *
  * The oracle for each body is generated mechanically: base-table tokens
  * are renamed `h_<table>` and the adapter views become a shared WITH
  * prelude, so Spark and DuckDB run the same adapter SQL and the same
  * query text.
  */
object TpchPort {

  // ---- adapter views: engine-neutral SQL, shared verbatim between the
  // Spark registration and the DuckDB oracle prelude ----

  private val lineitemExt =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         cast(l_shipdate AS date) AS l_shipdate,
         make_date(cast(1996 + (l_orderkey + l_linenumber) % 3 AS int),
                   cast(1 + (l_orderkey * 7 + l_linenumber * 3) % 12 AS int),
                   cast(1 + (l_partkey * 11 + l_linenumber) % 28 AS int)) AS l_commitdate,
         make_date(cast(1996 + (l_orderkey * 3 + l_linenumber) % 3 AS int),
                   cast(1 + (l_orderkey * 5 + l_linenumber * 7) % 12 AS int),
                   cast(1 + (l_suppkey * 13 + l_linenumber) % 28 AS int)) AS l_receiptdate,
         CASE cast((l_orderkey + l_linenumber) % 4 AS int)
           WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
           WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct,
         CASE cast((l_orderkey * 7 + l_linenumber) % 7 AS int)
           WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
           WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
           ELSE 'FOB' END AS l_shipmode
       FROM lineitem"""

  private val ordersExt =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         cast(o_orderdate AS date) AS o_orderdate, o_orderpriority,
         0 AS o_shippriority,
         'Clerk#' || cast(1 + o_orderkey % 1000 AS string) AS o_clerk,
         CASE WHEN o_orderkey % 50 = 0
           THEN 'handle with special care requests noted'
           ELSE 'quickly final deposits haggle blithely' END AS o_comment
       FROM orders"""

  private val customerExt =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         'Address#' || cast(c_custkey AS string) AS c_address,
         cast(10 + c_nationkey % 25 AS string) || '-555-'
           || cast(1000 + c_custkey % 9000 AS string) AS c_phone,
         CASE WHEN c_custkey % 7 = 0 THEN 'ironic pending requests sleep'
           ELSE 'carefully regular accounts nag' END AS c_comment
       FROM customer"""

  private val supplierExt =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
         'Address#' || cast(s_suppkey AS string) AS s_address,
         cast(10 + s_nationkey % 25 AS string) || '-555-'
           || cast(1000 + s_suppkey % 9000 AS string) AS s_phone,
         CASE WHEN s_suppkey % 10 = 0
           THEN 'slyly express Customer accounts Complaints about'
           ELSE 'quickly bold requests detect furiously' END AS s_comment
       FROM supplier"""

  private val partExt =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
         'Manufacturer#' || cast(1 + p_partkey % 5 AS string) AS p_mfgr,
         CASE cast(p_partkey % 8 AS int)
           WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX' WHEN 2 THEN 'SM PACK'
           WHEN 3 THEN 'SM PKG' WHEN 4 THEN 'MED BAG' WHEN 5 THEN 'MED BOX'
           WHEN 6 THEN 'LG CASE' ELSE 'LG BOX' END AS p_container
       FROM part"""

  private val partsuppExt =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         cast((l_partkey * 31 + l_suppkey * 17) % 9999 + 1 AS int) AS ps_availqty,
         cast((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS double) AS ps_supplycost,
         'regular dependencies sleep furiously' AS ps_comment
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) AS ps_base"""

  // ---- the 22 bodies: reference text with the documented adaptations ----

  private val bodies: Seq[(String, String)] = Seq(
    "h01" ->
      """select
    l_returnflag,
    l_linestatus,
    cast(sum(cast((l_quantity) as decimal(18,4))) as double) as sum_qty,
    cast(sum(cast((l_extendedprice) as decimal(18,4))) as double) as sum_base_price,
    cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as sum_disc_price,
    cast(sum(cast((l_extendedprice * (1 - l_discount) * (1 + l_tax)) as decimal(18,6))) as double) as sum_charge,
    cast(sum(cast((l_quantity) as decimal(18,4))) as double) / count(*) as avg_qty,
    cast(sum(cast((l_extendedprice) as decimal(18,4))) as double) / count(*) as avg_price,
    cast(sum(cast((l_discount) as decimal(18,4))) as double) / count(*) as avg_disc,
    count(*) as count_order
from
    lineitem
where
        l_shipdate <= date '1998-09-02'
group by
    l_returnflag,
    l_linestatus
order by
    l_returnflag,
    l_linestatus""",

    "h02" ->
      """select
    s_acctbal,
    s_name,
    n_name,
    p_partkey,
    p_mfgr,
    s_address,
    s_phone,
    s_comment
from
    part,
    supplier,
    partsupp,
    nation,
    region
where
        p_partkey = ps_partkey
  and s_suppkey = ps_suppkey
  and p_size = 15
  and p_type like '%STANDARD'
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'EUROPE'
  and ps_supplycost = (
    select
        min(ps_supplycost)
    from
        partsupp,
        supplier,
        nation,
        region
    where
            p_partkey = ps_partkey
      and s_suppkey = ps_suppkey
      and s_nationkey = n_nationkey
      and n_regionkey = r_regionkey
      and r_name = 'EUROPE'
)
order by
    s_acctbal desc,
    n_name,
    s_name,
    p_partkey""",

    "h03" ->
      """select
    l_orderkey,
    cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as revenue,
    cast(o_orderdate as string) as o_orderdate,
    o_shippriority
from
    customer,
    orders,
    lineitem
where
        c_mktsegment = 'BUILDING'
  and c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate < date '1995-03-15'
  and l_shipdate > date '1995-03-15'
group by
    l_orderkey,
    o_orderdate,
    o_shippriority
order by
    revenue desc,
    o_orderdate""",

    "h04" ->
      """select
    o_orderpriority,
    count(*) as order_count
from
    orders
where
        o_orderdate >= '1996-07-01'
  and o_orderdate < date '1996-07-01' + interval '3' month
  and exists (
        select
            *
        from
            lineitem
        where
                l_orderkey = o_orderkey
          and l_commitdate < l_receiptdate
    )
group by
    o_orderpriority
order by
    o_orderpriority""",

    "h05" ->
      """select
    n_name,
    cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as revenue
from
    customer,
    orders,
    lineitem,
    supplier,
    nation,
    region
where
        c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey
  and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey
  and r_name = 'ASIA'
  and o_orderdate >= date '1996-01-01'
  and o_orderdate < date '1997-01-01'
group by
    n_name
order by
    revenue desc""",

    "h06" ->
      """select
    cast(sum(cast((l_extendedprice * l_discount) as decimal(18,4))) as double) as revenue
from
    lineitem
where
        l_shipdate >= date '1996-01-01'
  and l_shipdate < date '1997-01-01'
  and l_discount between 0.06 - 0.01 and 0.06 + 0.01
  and l_quantity < 24""",

    "h07" ->
      """select
    supp_nation,
    cust_nation,
    l_year,
    cast(sum(cast((volume) as decimal(18,4))) as double) as revenue
from
    (
        select
            n1.n_name as supp_nation,
            n2.n_name as cust_nation,
            cast(extract(year from l_shipdate) as int) as l_year,
            l_extendedprice * (1 - l_discount) as volume
        from
            supplier,
            lineitem,
            orders,
            customer,
            nation n1,
            nation n2
        where
                s_suppkey = l_suppkey
          and o_orderkey = l_orderkey
          and c_custkey = o_custkey
          and s_nationkey = n1.n_nationkey
          and c_nationkey = n2.n_nationkey
          and (
                (n1.n_name = 'NATION_6' and n2.n_name = 'NATION_7')
                or (n1.n_name = 'NATION_7' and n2.n_name = 'NATION_6')
            )
          and l_shipdate between date '1995-01-01' and date '1996-12-31'
    ) as shipping
group by
    supp_nation,
    cust_nation,
    l_year
order by
    supp_nation,
    cust_nation,
    l_year""",

    "h08" ->
      """select
    o_year,
    cast(sum(cast((case
            when nation_name = 'NATION_1' then volume
            else 0
        end) as decimal(18,4))) as double)
      / cast(sum(cast((volume) as decimal(18,4))) as double) as mkt_share
from
    (
        select
            cast(extract(year from o_orderdate) as int) as o_year,
            l_extendedprice * (1 - l_discount) as volume,
            n2.n_name as nation_name
        from
            part,
            supplier,
            lineitem,
            orders,
            customer,
            nation n1,
            nation n2,
            region
        where
                p_partkey = l_partkey
          and s_suppkey = l_suppkey
          and l_orderkey = o_orderkey
          and o_custkey = c_custkey
          and c_nationkey = n1.n_nationkey
          and n1.n_regionkey = r_regionkey
          and r_name = 'AMERICA'
          and s_nationkey = n2.n_nationkey
          and o_orderdate between date '1995-01-01' and date '1996-12-31'
          and p_type = 'ECONOMY'
    ) as all_nations
group by
    o_year
order by
    o_year""",

    "h09" ->
      """select
    nation_name,
    o_year,
    cast(sum(cast((amount) as decimal(18,4))) as double) as sum_profit
from
    (
        select
            n_name as nation_name,
            cast(extract(year from o_orderdate) as int) as o_year,
            l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity as amount
        from
            part,
            supplier,
            lineitem,
            partsupp,
            orders,
            nation
        where
                s_suppkey = l_suppkey
          and ps_suppkey = l_suppkey
          and ps_partkey = l_partkey
          and p_partkey = l_partkey
          and o_orderkey = l_orderkey
          and s_nationkey = n_nationkey
          and p_name like '%red%'
    ) as profit
group by
    nation_name,
    o_year
order by
    nation_name,
    o_year desc""",

    "h10" ->
      """select
    c_custkey,
    c_name,
    cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as revenue,
    c_acctbal,
    n_name,
    c_address,
    c_phone,
    c_comment
from
    customer,
    orders,
    lineitem,
    nation
where
        c_custkey = o_custkey
  and l_orderkey = o_orderkey
  and o_orderdate >= date '1996-10-01'
  and o_orderdate < date '1997-01-01'
  and l_returnflag = 'R'
  and c_nationkey = n_nationkey
group by
    c_custkey,
    c_name,
    c_acctbal,
    c_phone,
    n_name,
    c_address,
    c_comment
order by
    revenue desc""",

    "h11" ->
      """select
    ps_partkey,
    cast(sum(cast((ps_supplycost * ps_availqty) as decimal(18,4))) as double) as value
from
    partsupp,
    supplier,
    nation
where
    ps_suppkey = s_suppkey
  and s_nationkey = n_nationkey
  and n_name = 'NATION_7'
group by
    ps_partkey having
    cast(sum(cast((ps_supplycost * ps_availqty) as decimal(18,4))) as double) > (
    select
    cast(sum(cast((ps_supplycost * ps_availqty) as decimal(18,4))) as double) * 0.0001
    from
    partsupp,
    supplier,
    nation
    where
    ps_suppkey = s_suppkey
                  and s_nationkey = n_nationkey
                  and n_name = 'NATION_7'
    )
order by
    value desc""",

    "h12" ->
      """select
    l_shipmode,
    cast(sum(case
            when o_orderpriority = '1-URGENT'
                or o_orderpriority = '2-HIGH'
                then 1
            else 0
        end) as bigint) as high_line_count,
    cast(sum(case
            when o_orderpriority <> '1-URGENT'
                and o_orderpriority <> '2-HIGH'
                then 1
            else 0
        end) as bigint) as low_line_count
from
    lineitem
        join
    orders
    on
            l_orderkey = o_orderkey
where
        l_shipmode in ('MAIL', 'SHIP')
  and l_commitdate < l_receiptdate
  and l_shipdate < l_commitdate
  and l_receiptdate >= date '1996-01-01'
  and l_receiptdate < date '1997-01-01'
group by
    l_shipmode
order by
    l_shipmode""",

    "h13" ->
      """select
    c_count,
    count(*) as custdist
from
    (
        select
            c_custkey,
            count(o_orderkey)
        from
            customer left outer join orders on
                        c_custkey = o_custkey
                    and o_comment not like '%special%requests%'
        group by
            c_custkey
    ) as c_orders (c_custkey, c_count)
group by
    c_count
order by
    custdist desc,
    c_count desc""",

    "h14" ->
      """select
            100.00 * cast(sum(cast((case
                             when p_type like 'PROMO%'
                                 then l_extendedprice * (1 - l_discount)
                             else 0
            end) as decimal(18,4))) as double)
            / cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as promo_revenue
from
    lineitem,
    part
where
        l_partkey = p_partkey
  and l_shipdate >= date '1995-09-01'
  and l_shipdate < date '1995-10-01'""",

    "h15" ->
      """with revenue0 (supplier_no, total_revenue) as (
    select
        l_suppkey,
        cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double)
    from
        lineitem
    where
        l_shipdate >= date '1996-01-01'
        and l_shipdate < date '1996-01-01' + interval '3' month
    group by
        l_suppkey
)
select
    s_suppkey,
    s_name,
    s_address,
    s_phone,
    total_revenue
from
    supplier,
    revenue0
where
    s_suppkey = supplier_no
    and total_revenue = (
        select
            max(total_revenue)
        from
            revenue0
    )
order by
    s_suppkey""",

    "h16" ->
      """select
    p_brand,
    p_type,
    p_size,
    count(distinct ps_suppkey) as supplier_cnt
from
    partsupp,
    part
where
        p_partkey = ps_partkey
  and p_brand <> 'Brand#45'
  and p_type not like 'MEDIUM%'
  and p_size in (49, 14, 23, 45, 19, 3, 36, 9)
  and ps_suppkey not in (
    select
        s_suppkey
    from
        supplier
    where
            s_comment like '%Customer%Complaints%'
)
group by
    p_brand,
    p_type,
    p_size
order by
    supplier_cnt desc,
    p_brand,
    p_type,
    p_size""",

    "h17" ->
      """select
        cast(sum(cast((l_extendedprice) as decimal(18,4))) as double) / 7.0 as avg_yearly
from
    lineitem,
    part
where
        p_partkey = l_partkey
  and p_brand = 'Brand#23'
  and p_container = 'MED BOX'
  and l_quantity < (
    select
            0.2 * (cast(sum(cast((l_quantity) as decimal(18,4))) as double) / count(*))
    from
        lineitem
    where
            l_partkey = p_partkey
)""",

    "h18" ->
      """select
    c_name,
    c_custkey,
    o_orderkey,
    cast(o_orderdate as string) as o_orderdate,
    o_totalprice,
    sum(l_quantity) as sum_qty
from
    customer,
    orders,
    lineitem
where
        o_orderkey in (
        select
            l_orderkey
        from
            lineitem
        group by
            l_orderkey having
                sum(l_quantity) > 300
    )
  and c_custkey = o_custkey
  and o_orderkey = l_orderkey
group by
    c_name,
    c_custkey,
    o_orderkey,
    o_orderdate,
    o_totalprice
order by
    o_totalprice desc,
    o_orderdate""",

    "h19" ->
      """select
    cast(sum(cast((l_extendedprice * (1 - l_discount)) as decimal(18,4))) as double) as revenue
from
    lineitem,
    part
where
    (
                p_partkey = l_partkey
            and p_brand = 'Brand#12'
            and p_container in ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
            and l_quantity >= 1 and l_quantity <= 1 + 10
            and p_size between 1 and 5
            and l_shipmode in ('AIR', 'AIR REG')
            and l_shipinstruct = 'DELIVER IN PERSON'
        )
   or
    (
                p_partkey = l_partkey
            and p_brand = 'Brand#23'
            and p_container in ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
            and l_quantity >= 10 and l_quantity <= 10 + 10
            and p_size between 1 and 10
            and l_shipmode in ('AIR', 'AIR REG')
            and l_shipinstruct = 'DELIVER IN PERSON'
        )
   or
    (
                p_partkey = l_partkey
            and p_brand = 'Brand#34'
            and p_container in ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
            and l_quantity >= 20 and l_quantity <= 20 + 10
            and p_size between 1 and 15
            and l_shipmode in ('AIR', 'AIR REG')
            and l_shipinstruct = 'DELIVER IN PERSON'
        )""",

    "h20" ->
      """select
    s_name,
    s_address
from
    supplier,
    nation
where
        s_suppkey in (
        select
            ps_suppkey
        from
            partsupp
        where
                ps_partkey in (
                select
                    p_partkey
                from
                    part
                where
                        p_name like 'red%'
            )
          and ps_availqty > (
            select
                    0.5 * sum(l_quantity)
            from
                lineitem
            where
                    l_partkey = ps_partkey
              and l_suppkey = ps_suppkey
              and l_shipdate >= date '1996-01-01'
              and l_shipdate < date '1996-01-01' + interval '1' year
        )
    )
  and s_nationkey = n_nationkey
  and n_name = 'NATION_11'
order by
    s_name""",

    "h21" ->
      """select
    s_name,
    count(*) as numwait
from
    supplier,
    lineitem l1,
    orders,
    nation
where
        s_suppkey = l1.l_suppkey
  and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F'
  and l1.l_receiptdate > l1.l_commitdate
  and exists (
        select
            *
        from
            lineitem l2
        where
                l2.l_orderkey = l1.l_orderkey
          and l2.l_suppkey <> l1.l_suppkey
    )
  and not exists (
        select
            *
        from
            lineitem l3
        where
                l3.l_orderkey = l1.l_orderkey
          and l3.l_suppkey <> l1.l_suppkey
          and l3.l_receiptdate > l3.l_commitdate
    )
  and s_nationkey = n_nationkey
  and n_name = 'NATION_4'
group by
    s_name
order by
    numwait desc,
    s_name""",

    "h22" ->
      """select
    cntrycode,
    count(*) as numcust,
    cast(sum(cast((c_acctbal) as decimal(18,4))) as double) as totacctbal
from
    (
        select
            substring(c_phone from 1 for 2) as cntrycode,
            c_acctbal
        from
            customer
        where
                substring(c_phone from 1 for 2) in
                ('13', '31', '23', '29', '30', '18', '17')
          and c_acctbal > (
            select
                cast(sum(cast((c_acctbal) as decimal(18,4))) as double) / count(*)
            from
                customer
            where
                    c_acctbal > 0.00
              and substring(c_phone from 1 for 2) in
                  ('13', '31', '23', '29', '30', '18', '17')
        )
          and not exists (
                select
                    *
                from
                    orders
                where
                        o_custkey = c_custkey
                  and o_orderdate < date '1995-07-01'
            )
    ) as custsale
group by
    cntrycode
order by
    cntrycode"""
  )

  /** Register the TPC-H adapter views: base tables first, then the
    * extended views built from the SAME shared SQL the oracle prelude
    * uses. All extension DataFrames are analyzed against the base views
    * BEFORE any `createOrReplaceTempView` (Spark analysis is eager), so
    * the same-name replacement cannot self-reference.
    */
  private[graft] def register(s: SparkSession, dir: String): Unit =
    graft.engine.CatalogState.bindIfNeeded(s, s"tpch:$dir") {
      Tables.register(s, dir, "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem")
      val exts = Seq(
        "partsupp" -> partsuppExt, "customer" -> customerExt,
        "supplier" -> supplierExt, "part" -> partExt,
        "orders" -> ordersExt, "lineitem" -> lineitemExt)
      exts.map { case (n, sql) => n -> s.sql(sql) }
        .foreach { case (n, df) => df.createOrReplaceTempView(n) }
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) =>
      name -> ((s: SparkSession, dir: String) => {
        register(s, dir)
        s.sql(body)
      })
    }.toMap

  // ---- oracle generation: rename base-table tokens to the h_ adapter
  // CTEs and prefix the shared prelude ----

  private val tableToken =
    "\\b(lineitem|orders|customer|supplier|partsupp|part|nation|region)\\b".r

  private def rename(sql: String): String =
    tableToken.replaceAllIn(sql, m => "h_" + m.group(1))

  private val prelude: String = Seq(
    s"h_region AS (SELECT * FROM region)",
    s"h_nation AS (SELECT * FROM nation)",
    s"h_customer AS ($customerExt)",
    s"h_supplier AS ($supplierExt)",
    s"h_part AS ($partExt)",
    s"h_orders AS ($ordersExt)",
    s"h_lineitem AS ($lineitemExt)",
    s"h_partsupp AS ($partsuppExt)").mkString(",\n")

  private def oracleize(body: String): String = {
    val b = rename(body).trim
    if (b.toLowerCase.startsWith("with "))
      s"WITH $prelude,\n${b.substring(5)}"
    else
      s"WITH $prelude\n$b"
  }

  val oracles: Map[String, String] =
    bodies.map { case (name, body) => name -> oracleize(body) }.toMap
}
