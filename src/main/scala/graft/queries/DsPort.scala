package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.engine.Tables

/** Verbatim port of the reference's TPC-DS query corpus — all 99 files
  * under `/root/reference/testdata/tpcds/queries/q1.sql`–`q99.sql` — as
  * `d01`–`d99`, run as-written through `spark.sql` over registered views,
  * with each body string doubling as its own DuckDB oracle. The reference
  * runs the same 99 files in `tests/tpcds_correctness_test.rs` (4 workers,
  * `register_tables` from `benchmarks/src/datasets/tpcds.rs`); together
  * with [[TpchPort]] (h01–h22) and [[CbPort]] (c00–c42) this closes
  * verbatim-corpus parity on all three of the reference's external suites.
  *
  * The driver fixture has no TPC-DS tables, so a single adapter prelude
  * synthesizes the 24-table star schema closed-form from the fixture —
  * engine-neutral SQL (`%`, `||`, `CASE`, `floor`, `extract`, date+int)
  * shared verbatim between the Spark view registration and the DuckDB
  * oracle prelude, following the [[TpchPort]] discipline. Design rules:
  *
  *  1. **Every synthesized money column is an integer-valued double**
  *     (`floor(...)` at the source). Sums of integer-valued doubles are
  *     exact below 2^53, so `sum`/`avg` and every HAVING / correlated
  *     threshold comparison is bit-identical across engines with NO
  *     decimal-cast rewrites — the lesson of the p47 float-hash rounds
  *     applied at schema level instead of query level.
  *  2. **Facts derive from `lineitem × orders`** sliced into the three
  *     channels by `(l_orderkey + l_linenumber) % 3`, so the item /
  *     customer / date domains overlap across channels (the cross-channel
  *     year-over-year queries q4/q11/q74 need that); returns are the
  *     `l_returnflag = 'R'` rows of each channel's slice (~1/3).
  *  3. **`d_date_sk` is days since 1995-01-01** (the fixture's first
  *     order date; 1995-01-01 is a Sunday, so `d_dow = n % 7` with the
  *     TPC-DS 0=Sunday convention), over a dense 2922-day calendar
  *     through 2002-12-31 that covers every synthesized ship/return
  *     offset (≤ +91 days). `d_month_seq` anchors 1200 = 1995-01, which
  *     keeps most of the corpus's `d_month_seq BETWEEN 1200 AND …`
  *     constants verbatim; date literals in 1995–2001 stay verbatim too.
  *  4. **Dense generators come from fixture cross-joins** (`nation²` =
  *     0..624, `× region` = dates, `²` = seconds) — no engine-specific
  *     `generate_series`, identical row sets by construction.
  *  5. All `_sk` keys are BIGINT in dims and facts (unifying Spark /
  *     DuckDB integer widths through joins and outputs).
  *
  * Query-text adaptation classes (each mechanical, never structural):
  * aliases on every output expression ([[CbPort]] class-1);
  * `cast(… AS bigint)` on integer sums and window ranks (class-2);
  * trailing tie-breaks on `ORDER BY … LIMIT` boundaries (class-3);
  * out-of-domain constants mapped into the synthesized domains
  * (class-4); DATE outputs cast to string (class-5); `stddev_samp`
  * expanded closed-form from exact integer sums in q17/q39 (class-6,
  * the same two engines disagree on incremental-variance rounding).
  */
object DsPort {

  // ---- dense generators (shared text; fixture tables only) ----

  private val seq625 =
    """SELECT cast(a.n_nationkey * 25 + b.n_nationkey AS int) AS n
       FROM nation a CROSS JOIN nation b"""

  /** Day numbers 0..2921 = 1995-01-01..2002-12-31 with the mapped date. */
  private val ddBase =
    """SELECT cast(s.n * 5 + r.r_regionkey AS int) AS n,
              date '1995-01-01' + (s.n * 5 + r.r_regionkey) AS d
       FROM td_seq625 s CROSS JOIN region r
       WHERE s.n * 5 + r.r_regionkey < 2922"""

  private val dateDim =
    """SELECT cast(n AS bigint) AS d_date_sk,
              d AS d_date,
              cast(extract(year FROM d) AS int) AS d_year,
              cast(extract(month FROM d) AS int) AS d_moy,
              cast(extract(day FROM d) AS int) AS d_dom,
              cast(floor((extract(month FROM d) + 2) / 3.0) AS int) AS d_qoy,
              cast(n % 7 AS int) AS d_dow,
              cast(floor(n / 7.0) AS int) + 740 AS d_week_seq,
              cast(1200 + (extract(year FROM d) - 1995) * 12
                   + extract(month FROM d) - 1 AS int) AS d_month_seq,
              cast(extract(year FROM d) AS string) || 'Q'
                || cast(cast(floor((extract(month FROM d) + 2) / 3.0) AS int) AS string)
                AS d_quarter_name,
              CASE cast(n % 7 AS int)
                WHEN 0 THEN 'Sunday'    WHEN 1 THEN 'Monday'
                WHEN 2 THEN 'Tuesday'   WHEN 3 THEN 'Wednesday'
                WHEN 4 THEN 'Thursday'  WHEN 5 THEN 'Friday'
                ELSE 'Saturday' END AS d_day_name
       FROM td_dd"""

  private val timeDim =
    """SELECT cast(a.n * 625 + b.n AS bigint) AS t_time_sk,
              cast(a.n * 625 + b.n AS int) AS t_time,
              cast(floor((a.n * 625 + b.n) / 3600.0) AS int) AS t_hour,
              cast(floor(((a.n * 625 + b.n) % 3600) / 60.0) AS int) AS t_minute,
              CASE WHEN floor((a.n * 625 + b.n) / 3600.0) BETWEEN 6 AND 8 THEN 'breakfast'
                   WHEN floor((a.n * 625 + b.n) / 3600.0) BETWEEN 11 AND 13 THEN 'lunch'
                   WHEN floor((a.n * 625 + b.n) / 3600.0) BETWEEN 17 AND 19 THEN 'dinner'
                   ELSE NULL END AS t_meal_time
       FROM td_seq625 a CROSS JOIN td_seq625 b
       WHERE a.n * 625 + b.n < 86400"""

  // ---- dimensions ----

  private val item =
    """SELECT cast(p_partkey AS bigint) AS i_item_sk,
              'ITEM_' || lpad(cast(p_partkey AS string), 8, '0') AS i_item_id,
              p_name AS i_item_desc,
              p_name AS i_product_name,
              'Brand_' || cast(p_partkey % 50 AS string) AS i_brand,
              cast(p_partkey % 50 AS int) AS i_brand_id,
              CASE cast(p_partkey % 10 AS int)
                WHEN 0 THEN 'Books'  WHEN 1 THEN 'Children' WHEN 2 THEN 'Electronics'
                WHEN 3 THEN 'Home'   WHEN 4 THEN 'Jewelry'  WHEN 5 THEN 'Men'
                WHEN 6 THEN 'Music'  WHEN 7 THEN 'Shoes'    WHEN 8 THEN 'Sports'
                ELSE 'Women' END AS i_category,
              cast(p_partkey % 10 AS int) AS i_category_id,
              'class_' || cast(p_partkey % 20 AS string) AS i_class,
              cast(p_partkey % 20 AS int) AS i_class_id,
              CASE cast(p_partkey % 12 AS int)
                WHEN 0 THEN 'peru'   WHEN 1 THEN 'powder' WHEN 2 THEN 'slate'
                WHEN 3 THEN 'pale'   WHEN 4 THEN 'ghost'  WHEN 5 THEN 'olive'
                WHEN 6 THEN 'salmon' WHEN 7 THEN 'peach'  WHEN 8 THEN 'sienna'
                WHEN 9 THEN 'rose'   WHEN 10 THEN 'spring' ELSE 'snow' END AS i_color,
              CASE cast(p_partkey % 7 AS int)
                WHEN 0 THEN 'small'   WHEN 1 THEN 'medium' WHEN 2 THEN 'large'
                WHEN 3 THEN 'extra large' WHEN 4 THEN 'economy'
                WHEN 5 THEN 'petite'  ELSE 'N/A' END AS i_size,
              CASE cast(p_partkey % 6 AS int)
                WHEN 0 THEN 'Each' WHEN 1 THEN 'Dozen' WHEN 2 THEN 'Case'
                WHEN 3 THEN 'Pack' WHEN 4 THEN 'Box' ELSE 'Bundle' END AS i_units,
              'Manufact_' || cast(p_partkey % 100 AS string) AS i_manufact,
              cast(p_partkey % 100 AS int) AS i_manufact_id,
              cast(p_partkey % 100 AS int) AS i_manager_id,
              (floor(p_retailprice / 20) + (p_partkey * 7) % 80) * 1e0 AS i_current_price,
              floor((floor(p_retailprice / 20) + (p_partkey * 7) % 80) * 0.6) * 1e0 AS i_wholesale_cost
       FROM part"""

  private val customerDs =
    """SELECT cast(c_custkey AS bigint) AS c_customer_sk,
              'CUST_' || lpad(cast(c_custkey AS string), 8, '0') AS c_customer_id,
              c_name AS c_first_name,
              'Last' || cast(c_custkey % 200 AS string) AS c_last_name,
              CASE cast(c_custkey % 6 AS int)
                WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.' WHEN 2 THEN 'Ms.'
                WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Sir' ELSE 'Miss' END AS c_salutation,
              CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
              cast(1924 + c_custkey % 69 AS int) AS c_birth_year,
              cast(1 + c_custkey % 12 AS int) AS c_birth_month,
              cast(1 + c_custkey % 28 AS int) AS c_birth_day,
              n_name AS c_birth_country,
              c_name || '@example.com' AS c_email_address,
              'login_' || cast(c_custkey AS string) AS c_login,
              cast(c_custkey % 625 AS bigint) AS c_current_addr_sk,
              cast((c_custkey * 17) % 625 AS bigint) AS c_current_cdemo_sk,
              cast((c_custkey * 19) % 625 AS bigint) AS c_current_hdemo_sk,
              cast((c_custkey * 37) % 2000 AS bigint) AS c_first_sales_date_sk,
              cast((c_custkey * 37) % 2000 + 30 AS bigint) AS c_first_shipto_date_sk,
              cast((c_custkey * 41) % 2000 AS bigint) AS c_last_review_date_sk
       FROM customer JOIN nation ON c_nationkey = n_nationkey"""

  private val customerAddress =
    """SELECT cast(n AS bigint) AS ca_address_sk,
              'ADDR_' || lpad(cast(n AS string), 8, '0') AS ca_address_id,
              cast(n % 900 + 100 AS string) AS ca_street_number,
              'Street' || cast(n % 40 AS string) AS ca_street_name,
              CASE cast(n % 4 AS int) WHEN 0 THEN 'Ave' WHEN 1 THEN 'Blvd'
                WHEN 2 THEN 'Ln' ELSE 'Ct' END AS ca_street_type,
              'Suite ' || cast(n % 100 AS string) AS ca_suite_number,
              CASE cast(n % 12 AS int)
                WHEN 0 THEN 'Edgewood'  WHEN 1 THEN 'Fairview' WHEN 2 THEN 'Midway'
                WHEN 3 THEN 'Oakland'   WHEN 4 THEN 'Lebanon'  WHEN 5 THEN 'Georgetown'
                WHEN 6 THEN 'Salem'     WHEN 7 THEN 'Clinton'  WHEN 8 THEN 'Marion'
                WHEN 9 THEN 'Union'     WHEN 10 THEN 'Antioch' ELSE 'Oak Grove' END AS ca_city,
              CASE cast(n % 8 AS int)
                WHEN 0 THEN 'Williamson County' WHEN 1 THEN 'Franklin Parish'
                WHEN 2 THEN 'Walker County'     WHEN 3 THEN 'Ziebach County'
                WHEN 4 THEN 'Fairfield County'  WHEN 5 THEN 'Barrow County'
                WHEN 6 THEN 'Bronx County'      ELSE 'Orange County' END AS ca_county,
              CASE cast(n % 10 AS int)
                WHEN 0 THEN 'TX' WHEN 1 THEN 'OH' WHEN 2 THEN 'CA' WHEN 3 THEN 'GA'
                WHEN 4 THEN 'NY' WHEN 5 THEN 'IL' WHEN 6 THEN 'FL' WHEN 7 THEN 'WA'
                WHEN 8 THEN 'MI' ELSE 'PA' END AS ca_state,
              lpad(cast((n % 40) * 7 + 13 AS string), 5, '0') AS ca_zip,
              'United States' AS ca_country,
              cast(-5 - (n % 4) AS double) AS ca_gmt_offset,
              CASE cast(n % 3 AS int) WHEN 0 THEN 'apartment'
                WHEN 1 THEN 'condo' ELSE 'single family' END AS ca_location_type
       FROM td_seq625"""

  private val customerDemographics =
    """SELECT cast(n AS bigint) AS cd_demo_sk,
              CASE WHEN n % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
              CASE cast(n % 5 AS int) WHEN 0 THEN 'M' WHEN 1 THEN 'S'
                WHEN 2 THEN 'D' WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
              CASE cast(n % 7 AS int)
                WHEN 0 THEN 'Primary'      WHEN 1 THEN 'Secondary'
                WHEN 2 THEN 'College'      WHEN 3 THEN '2 yr Degree'
                WHEN 4 THEN '4 yr Degree'  WHEN 5 THEN 'Advanced Degree'
                ELSE 'Unknown' END AS cd_education_status,
              cast(500 * (1 + n % 20) AS int) AS cd_purchase_estimate,
              CASE cast(n % 4 AS int) WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk'
                WHEN 2 THEN 'Low Risk' ELSE 'Unknown' END AS cd_credit_rating,
              cast(n % 7 AS int) AS cd_dep_count,
              cast((n * 3) % 7 AS int) AS cd_dep_employed_count,
              cast((n * 5) % 7 AS int) AS cd_dep_college_count
       FROM td_seq625"""

  private val householdDemographics =
    """SELECT cast(n AS bigint) AS hd_demo_sk,
              cast(n % 20 AS bigint) AS hd_income_band_sk,
              CASE cast(n % 6 AS int)
                WHEN 0 THEN '0-500'      WHEN 1 THEN '501-1000'
                WHEN 2 THEN '1001-5000'  WHEN 3 THEN '5001-10000'
                WHEN 4 THEN '>10000'     ELSE 'Unknown' END AS hd_buy_potential,
              cast(n % 10 AS int) AS hd_dep_count,
              cast(n % 6 - 1 AS int) AS hd_vehicle_count
       FROM td_seq625"""

  private val incomeBand =
    """SELECT cast(n AS bigint) AS ib_income_band_sk,
              cast(n * 10000 AS int) AS ib_lower_bound,
              cast((n + 1) * 10000 AS int) AS ib_upper_bound
       FROM td_seq625 WHERE n < 20"""

  private val store =
    """SELECT cast(n_nationkey % 12 AS bigint) AS s_store_sk,
              'STORE_' || lpad(cast(n_nationkey % 12 AS string), 4, '0') AS s_store_id,
              CASE cast(n_nationkey % 8 AS int)
                WHEN 0 THEN 'ought' WHEN 1 THEN 'able'  WHEN 2 THEN 'pri'
                WHEN 3 THEN 'ese'   WHEN 4 THEN 'anti'  WHEN 5 THEN 'cally'
                WHEN 6 THEN 'ation' ELSE 'eing' END AS s_store_name,
              cast(200 + n_nationkey % 12 * 8 AS int) AS s_number_employees,
              CASE cast(n_nationkey % 12 % 12 AS int)
                WHEN 0 THEN 'Edgewood'  WHEN 1 THEN 'Fairview' WHEN 2 THEN 'Midway'
                WHEN 3 THEN 'Oakland'   WHEN 4 THEN 'Lebanon'  WHEN 5 THEN 'Georgetown'
                WHEN 6 THEN 'Salem'     WHEN 7 THEN 'Clinton'  WHEN 8 THEN 'Marion'
                WHEN 9 THEN 'Union'     WHEN 10 THEN 'Antioch' ELSE 'Oak Grove' END AS s_city,
              CASE cast(n_nationkey % 8 AS int)
                WHEN 0 THEN 'Williamson County' WHEN 1 THEN 'Franklin Parish'
                WHEN 2 THEN 'Walker County'     WHEN 3 THEN 'Ziebach County'
                WHEN 4 THEN 'Fairfield County'  WHEN 5 THEN 'Barrow County'
                WHEN 6 THEN 'Bronx County'      ELSE 'Orange County' END AS s_county,
              CASE cast(n_nationkey % 5 AS int)
                WHEN 0 THEN 'TN' WHEN 1 THEN 'OH' WHEN 2 THEN 'CA' WHEN 3 THEN 'GA'
                ELSE 'NY' END AS s_state,
              lpad(cast((n_nationkey % 12 * 35 + 13) % 100000 AS string), 5, '0') AS s_zip,
              cast(n_nationkey % 12 % 5 AS int) AS s_company_id,
              'Company_' || cast(n_nationkey % 12 % 5 AS string) AS s_company_name,
              cast(1 + n_nationkey % 10 AS int) AS s_market_id,
              cast(n_nationkey % 12 * 100 AS string) AS s_street_number,
              'Street' || cast(n_nationkey % 12 AS string) AS s_street_name,
              'Blvd' AS s_street_type,
              'Suite ' || cast(n_nationkey % 12 AS string) AS s_suite_number,
              cast(-5 - (n_nationkey % 12 % 4) AS double) AS s_gmt_offset
       FROM nation WHERE n_nationkey < 12"""

  private val warehouse =
    """SELECT cast(r_regionkey AS bigint) AS w_warehouse_sk,
              'Warehouse_' || cast(r_regionkey AS string) AS w_warehouse_name,
              cast(30000 + r_regionkey * 12500 AS int) AS w_warehouse_sq_ft,
              CASE cast(r_regionkey % 5 AS int)
                WHEN 0 THEN 'Edgewood' WHEN 1 THEN 'Fairview' WHEN 2 THEN 'Midway'
                WHEN 3 THEN 'Oakland'  ELSE 'Lebanon' END AS w_city,
              CASE cast(r_regionkey % 5 AS int)
                WHEN 0 THEN 'Williamson County' WHEN 1 THEN 'Franklin Parish'
                WHEN 2 THEN 'Walker County'     WHEN 3 THEN 'Ziebach County'
                ELSE 'Fairfield County' END AS w_county,
              CASE cast(r_regionkey % 5 AS int)
                WHEN 0 THEN 'TX' WHEN 1 THEN 'OH' WHEN 2 THEN 'CA'
                WHEN 3 THEN 'GA' ELSE 'NY' END AS w_state,
              'United States' AS w_country
       FROM region"""

  private val webSite =
    """SELECT cast(n_nationkey % 12 AS bigint) AS web_site_sk,
              'WEB_' || lpad(cast(n_nationkey % 12 AS string), 4, '0') AS web_site_id,
              'site_' || cast(n_nationkey % 6 AS string) AS web_name,
              'Company_' || cast(n_nationkey % 5 AS string) AS web_company_name
       FROM nation WHERE n_nationkey < 12"""

  private val webPage =
    """SELECT cast(n AS bigint) AS wp_web_page_sk,
              cast(4000 + n * 80 AS int) AS wp_char_count
       FROM td_seq625 WHERE n < 30"""

  private val callCenter =
    """SELECT cast(r_regionkey % 4 AS bigint) AS cc_call_center_sk,
              'CC_' || lpad(cast(r_regionkey % 4 AS string), 4, '0') AS cc_call_center_id,
              CASE cast(r_regionkey % 4 AS int)
                WHEN 0 THEN 'NY Metro' WHEN 1 THEN 'Mid Atlantic'
                WHEN 2 THEN 'North Midwest' ELSE 'Pacific Northwest' END AS cc_name,
              'Manager_' || cast(r_regionkey % 4 AS string) AS cc_manager,
              CASE cast(r_regionkey % 4 AS int)
                WHEN 0 THEN 'Williamson County' WHEN 1 THEN 'Franklin Parish'
                WHEN 2 THEN 'Walker County' ELSE 'Ziebach County' END AS cc_county
       FROM region WHERE r_regionkey < 4"""

  private val catalogPage =
    """SELECT cast(n AS bigint) AS cp_catalog_page_sk,
              'PAGE_' || lpad(cast(n AS string), 6, '0') AS cp_catalog_page_id
       FROM td_seq625 WHERE n < 100"""

  private val shipMode =
    """SELECT cast(n_nationkey AS bigint) AS sm_ship_mode_sk,
              CASE cast(n_nationkey % 7 AS int)
                WHEN 0 THEN 'EXPRESS'  WHEN 1 THEN 'OVERNIGHT' WHEN 2 THEN 'TWO DAY'
                WHEN 3 THEN 'NEXT DAY' WHEN 4 THEN 'REGULAR'   WHEN 5 THEN 'LIBRARY'
                ELSE 'MAIL' END AS sm_type,
              CASE cast(n_nationkey % 7 AS int)
                WHEN 0 THEN 'UPS' WHEN 1 THEN 'FEDEX' WHEN 2 THEN 'AIRBORNE'
                WHEN 3 THEN 'USPS' WHEN 4 THEN 'DHL' WHEN 5 THEN 'TBS'
                ELSE 'ZM' END AS sm_carrier
       FROM nation WHERE n_nationkey < 7"""

  private val reason =
    """SELECT cast(n_nationkey AS bigint) AS r_reason_sk,
              'reason ' || cast(n_nationkey AS string) AS r_reason_desc
       FROM nation WHERE n_nationkey < 10"""

  private val promotion =
    """SELECT cast(n AS bigint) AS p_promo_sk,
              CASE WHEN n % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
              CASE WHEN n % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
              CASE WHEN n % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
              CASE WHEN n % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event
       FROM td_seq625 WHERE n < 30"""

  // ---- fact base: lineitem × orders × day number, common derived
  // columns; every money column floor()ed to an integer-valued double ----

  private val factBase =
    """SELECT l_orderkey AS ok, l_partkey AS pk, l_linenumber AS ln,
              o_custkey AS ck, dm.n AS dsk, l_returnflag AS rf,
              cast((l_orderkey + l_linenumber) % 3 AS int) AS ch,
              cast(l_quantity AS int) AS qty,
              cast((l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS bigint) AS tsk,
              floor(l_extendedprice) * 1e0 AS ext_list,
              floor(l_extendedprice * (1 - l_discount)) * 1e0 AS ext_sales,
              (floor(l_extendedprice) - floor(l_extendedprice * (1 - l_discount))) * 1e0 AS ext_disc,
              floor(l_extendedprice * 0.6) * 1e0 AS ext_whole,
              floor(floor(l_extendedprice * (1 - l_discount)) * l_tax) * 1e0 AS ext_tax,
              CASE WHEN (l_orderkey + l_partkey) % 5 = 0
                THEN floor(floor(l_extendedprice * (1 - l_discount)) * 0.2) * 1e0
                ELSE cast(0 AS double) END AS coupon,
              floor(l_extendedprice / l_quantity) * 1e0 AS unit_list,
              floor(floor(l_extendedprice / l_quantity) * (1 - l_discount)) * 1e0 AS unit_sales,
              floor(floor(l_extendedprice / l_quantity) * 0.6) * 1e0 AS unit_whole,
              floor(floor(l_extendedprice * 0.6) * 0.25) * 1e0 AS ship_cost,
              cast((o_custkey * 13 + l_partkey * 7 + l_linenumber) % 625 AS bigint) AS cdemo,
              cast((o_custkey * 11 + l_orderkey) % 625 AS bigint) AS hdemo,
              CASE WHEN (l_orderkey * 7 + l_partkey) % 20 = 0 THEN NULL
                WHEN (l_orderkey + l_partkey) % 4 = 0
                  THEN cast((o_custkey + l_orderkey) % 625 AS bigint)
                ELSE cast(o_custkey % 625 AS bigint) END AS addr,
              cast((l_orderkey + l_linenumber * 5) % 12 AS bigint) AS stk,
              cast((l_partkey + l_linenumber) % 5 AS bigint) AS whk,
              cast(l_orderkey % 4 AS bigint) AS cck,
              cast((l_partkey * 3 + l_orderkey) % 100 AS bigint) AS cpk,
              cast((l_orderkey + l_partkey) % 7 AS bigint) AS smk,
              cast((l_orderkey + l_partkey) % 30 AS bigint) AS prk,
              cast((l_orderkey * 3 + l_partkey) % 10 AS bigint) AS rsk,
              cast(dm.n + 1 + (l_orderkey * 3 + l_linenumber) % 30 AS bigint) AS shipd,
              cast(dm.n + 1 + (l_orderkey + l_linenumber) % 60 AS bigint) AS retd,
              cast(floor(l_quantity / 2) AS int) + 1 AS ret_qty,
              floor(floor(l_extendedprice / l_quantity) * (1 - l_discount))
                * (cast(floor(l_quantity / 2) AS int) + 1) * 1e0 AS ret_amt,
              l_tax AS taxr
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN (SELECT n, d FROM td_dd) dm ON dm.d = cast(o_orderdate AS date)"""

  private val storeSales =
    """SELECT cast(dsk AS bigint) AS ss_sold_date_sk, tsk AS ss_sold_time_sk,
              cast(pk AS bigint) AS ss_item_sk, cast(ck AS bigint) AS ss_customer_sk,
              cdemo AS ss_cdemo_sk, hdemo AS ss_hdemo_sk, addr AS ss_addr_sk,
              stk AS ss_store_sk, prk AS ss_promo_sk,
              cast(ok AS bigint) AS ss_ticket_number,
              qty AS ss_quantity, unit_whole AS ss_wholesale_cost,
              unit_list AS ss_list_price, unit_sales AS ss_sales_price,
              ext_disc AS ss_ext_discount_amt, ext_sales AS ss_ext_sales_price,
              ext_whole AS ss_ext_wholesale_cost, ext_list AS ss_ext_list_price,
              ext_tax AS ss_ext_tax, coupon AS ss_coupon_amt,
              ext_sales - coupon AS ss_net_paid,
              ext_sales - coupon + ext_tax AS ss_net_paid_inc_tax,
              ext_sales - coupon - ext_whole AS ss_net_profit
       FROM td_fact WHERE ch = 0"""

  private val storeReturns =
    """SELECT retd AS sr_returned_date_sk, cast(pk AS bigint) AS sr_item_sk,
              cast(ck AS bigint) AS sr_customer_sk, cdemo AS sr_cdemo_sk,
              stk AS sr_store_sk, rsk AS sr_reason_sk,
              cast(ok AS bigint) AS sr_ticket_number,
              ret_qty AS sr_return_quantity, ret_amt AS sr_return_amt,
              ret_amt + floor(ret_amt * taxr) * 1e0 AS sr_return_amt_inc_tax,
              floor(ret_amt * 0.7) * 1e0 AS sr_refunded_cash,
              (floor(ret_amt * 0.5) + 10) * 1e0 AS sr_net_loss,
              cast(5 + ok % 45 AS double) AS sr_fee
       FROM td_fact WHERE ch = 0 AND rf = 'R'"""

  private val catalogSales =
    """SELECT cast(dsk AS bigint) AS cs_sold_date_sk, tsk AS cs_sold_time_sk,
              shipd AS cs_ship_date_sk,
              cast(ck AS bigint) AS cs_bill_customer_sk,
              cdemo AS cs_bill_cdemo_sk, hdemo AS cs_bill_hdemo_sk,
              addr AS cs_bill_addr_sk,
              cast(ck AS bigint) AS cs_ship_customer_sk, addr AS cs_ship_addr_sk,
              cck AS cs_call_center_sk, cpk AS cs_catalog_page_sk,
              smk AS cs_ship_mode_sk, whk AS cs_warehouse_sk,
              cast(pk AS bigint) AS cs_item_sk, prk AS cs_promo_sk,
              cast(ok AS bigint) AS cs_order_number,
              qty AS cs_quantity, unit_whole AS cs_wholesale_cost,
              unit_list AS cs_list_price, unit_sales AS cs_sales_price,
              ext_disc AS cs_ext_discount_amt, ext_sales AS cs_ext_sales_price,
              ext_whole AS cs_ext_wholesale_cost, ext_list AS cs_ext_list_price,
              ext_tax AS cs_ext_tax, coupon AS cs_coupon_amt,
              ship_cost AS cs_ext_ship_cost,
              ext_sales - coupon AS cs_net_paid,
              ext_sales - coupon + ext_tax AS cs_net_paid_inc_tax,
              ext_sales - coupon - ext_whole AS cs_net_profit
       FROM td_fact WHERE ch = 1"""

  private val catalogReturns =
    """SELECT retd AS cr_returned_date_sk, cast(pk AS bigint) AS cr_item_sk,
              cast(ok AS bigint) AS cr_order_number,
              cast(ck AS bigint) AS cr_returning_customer_sk,
              cast(ck AS bigint) AS cr_refunded_customer_sk,
              addr AS cr_returning_addr_sk, addr AS cr_refunded_addr_sk,
              cck AS cr_call_center_sk, cpk AS cr_catalog_page_sk,
              rsk AS cr_reason_sk,
              ret_qty AS cr_return_quantity, ret_amt AS cr_return_amount,
              ret_amt + floor(ret_amt * taxr) * 1e0 AS cr_return_amt_inc_tax,
              floor(ret_amt * 0.7) * 1e0 AS cr_refunded_cash,
              floor(ret_amt * 0.2) * 1e0 AS cr_reversed_charge,
              ret_amt - floor(ret_amt * 0.7) * 1e0 - floor(ret_amt * 0.2) AS cr_store_credit,
              (floor(ret_amt * 0.5) + 10) * 1e0 AS cr_net_loss
       FROM td_fact WHERE ch = 1 AND rf = 'R'"""

  private val webSales =
    """SELECT cast(dsk AS bigint) AS ws_sold_date_sk, tsk AS ws_sold_time_sk,
              shipd AS ws_ship_date_sk,
              cast(pk AS bigint) AS ws_item_sk,
              cast(ck AS bigint) AS ws_bill_customer_sk,
              cdemo AS ws_bill_cdemo_sk, hdemo AS ws_bill_hdemo_sk,
              addr AS ws_bill_addr_sk,
              cast(ck AS bigint) AS ws_ship_customer_sk, addr AS ws_ship_addr_sk,
              hdemo AS ws_ship_hdemo_sk, smk AS ws_ship_mode_sk,
              cast((ok + pk) % 30 AS bigint) AS ws_web_page_sk,
              cast((ok + ln * 5) % 12 AS bigint) AS ws_web_site_sk,
              whk AS ws_warehouse_sk, prk AS ws_promo_sk,
              cast(ok AS bigint) AS ws_order_number,
              qty AS ws_quantity, unit_whole AS ws_wholesale_cost,
              unit_list AS ws_list_price, unit_sales AS ws_sales_price,
              ext_disc AS ws_ext_discount_amt, ext_sales AS ws_ext_sales_price,
              ext_whole AS ws_ext_wholesale_cost, ext_list AS ws_ext_list_price,
              ext_tax AS ws_ext_tax, coupon AS ws_coupon_amt,
              ship_cost AS ws_ext_ship_cost,
              ext_sales - coupon AS ws_net_paid,
              ext_sales - coupon + ext_tax AS ws_net_paid_inc_tax,
              ext_sales - coupon - ext_whole AS ws_net_profit
       FROM td_fact WHERE ch = 2"""

  private val webReturns =
    """SELECT retd AS wr_returned_date_sk, cast(pk AS bigint) AS wr_item_sk,
              cast(ok AS bigint) AS wr_order_number,
              cast(ck AS bigint) AS wr_returning_customer_sk,
              cast(ck AS bigint) AS wr_refunded_customer_sk,
              cdemo AS wr_returning_cdemo_sk, cdemo AS wr_refunded_cdemo_sk,
              addr AS wr_returning_addr_sk, addr AS wr_refunded_addr_sk,
              rsk AS wr_reason_sk,
              cast((ok + pk) % 30 AS bigint) AS wr_web_page_sk,
              ret_qty AS wr_return_quantity, ret_amt AS wr_return_amt,
              floor(ret_amt * 0.7) * 1e0 AS wr_refunded_cash,
              cast(5 + ok % 45 AS double) AS wr_fee,
              (floor(ret_amt * 0.5) + 10) * 1e0 AS wr_net_loss
       FROM td_fact WHERE ch = 2 AND rf = 'R'"""

  private val inventory =
    """SELECT cast(p_partkey AS bigint) AS inv_item_sk,
              w.w_warehouse_sk AS inv_warehouse_sk,
              d.d_date_sk AS inv_date_sk,
              cast((p_partkey * 7 + w.w_warehouse_sk * 13 + d.d_date_sk) % 1000 AS int)
                AS inv_quantity_on_hand
       FROM part CROSS JOIN td_warehouse w
       JOIN td_date_dim d ON d.d_dow = 0 AND d.d_year BETWEEN 1999 AND 2001
       WHERE p_partkey % 4 = 0"""

  // ---- shared prelude assembly ----

  /** (name, sql) in dependency order. The prelude names are td_-prefixed
    * so the DuckDB CTEs cannot self-reference the fixture views they are
    * built from; the Spark registration strips the prefix (temp views can
    * shadow, because each view body is analyzed eagerly against the
    * PREVIOUS binding before `createOrReplaceTempView`, the [[TpchPort]]
    * trick). `inventory` references the td_ names directly so one text
    * serves both engines.
    */
  private val adapters: Seq[(String, String)] = Seq(
    "td_seq625" -> seq625,
    "td_dd" -> ddBase,
    "td_date_dim" -> dateDim,
    "td_time_dim" -> timeDim,
    "td_item" -> item,
    "td_customer" -> customerDs,
    "td_customer_address" -> customerAddress,
    "td_customer_demographics" -> customerDemographics,
    "td_household_demographics" -> householdDemographics,
    "td_income_band" -> incomeBand,
    "td_store" -> store,
    "td_warehouse" -> warehouse,
    "td_web_site" -> webSite,
    "td_web_page" -> webPage,
    "td_call_center" -> callCenter,
    "td_catalog_page" -> catalogPage,
    "td_ship_mode" -> shipMode,
    "td_reason" -> reason,
    "td_promotion" -> promotion,
    "td_fact" -> factBase,
    "td_store_sales" -> storeSales,
    "td_store_returns" -> storeReturns,
    "td_catalog_sales" -> catalogSales,
    "td_catalog_returns" -> catalogReturns,
    "td_web_sales" -> webSales,
    "td_web_returns" -> webReturns,
    "td_inventory" -> inventory)

  /** TPC-DS table tokens in query bodies, longest-first so e.g.
    * `customer_address` wins over `customer`. */
  private val tableToken =
    ("\\b(customer_demographics|household_demographics|customer_address|" +
      "catalog_returns|catalog_sales|store_returns|catalog_page|store_sales|" +
      "web_returns|income_band|call_center|web_sales|ship_mode|promotion|" +
      "warehouse|inventory|date_dim|time_dim|web_site|web_page|customer|" +
      "reason|store|item)\\b").r

  /** Rename table tokens OUTSIDE single-quoted literals only — q5's
    * `'store channel'` / `concat('store', …)` literals must survive. */
  private def rename(sql: String): String = {
    val parts = sql.split("'", -1)
    parts.zipWithIndex.map { case (p, i) =>
      if (i % 2 == 0) tableToken.replaceAllIn(p, m => "td_" + m.group(1)) else p
    }.mkString("'")
  }

  /** Register in Spark: adapter outputs BOTH under their td_ names
    * (handy for debugging) and under the bare TPC-DS names the query
    * bodies use — all backed by parquet materialized once per fixture
    * directory (below).
    *
    * r09 cached only the ANALYZED DataFrames, so every reference to
    * store_sales/catalog_sales/web_sales re-executed the
    * `lineitem ⋈ orders ⋈ calendar` derivation — d49's stage breakdown
    * showed six full derivation scans before any query work, and the
    * pattern repeated across all 99 d-queries (roughly half the d-suite
    * bench time). A real deployment reads STORED fact tables; the
    * scale-correct analog is to materialize the 27 deterministic adapter
    * outputs once per fixture dir as parquet — `td_fact` first, so the
    * six channel tables derive from the stored fact instead of six more
    * joins — and register plain parquet scans, which also gives the
    * d-suite date filters parquet row-group pruning for free.
    *
    * The cache is keyed by a fingerprint of the fixture files (driver
    * regeneration → new key → fresh materialization) and holds only
    * paths + schemas — no SparkSession references, so stopped sessions
    * are collectable (the r09 cache strongly retained them; ADVICE r09).
    * The DuckDB oracle prelude below is untouched: the oracle still
    * re-derives everything from the same fixture SQL, keeping the
    * differential check independent of this cache.
    */
  private case class Mat(name: String, path: String, schema: StructType)

  private val materialized =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Mat]]()

  /** Adapter outputs large enough to keep multiple parquet files. */
  private val heavyTables = Set("td_fact", "td_store_sales", "td_store_returns",
    "td_catalog_sales", "td_catalog_returns", "td_web_sales", "td_web_returns",
    "td_inventory")

  /** Fixture tables the adapter SQL reads; their sizes+mtimes key the cache. */
  private val fixtureInputs =
    Seq("region", "nation", "customer", "part", "orders", "lineitem")

  private def fingerprint(dir: String): String = {
    def stamp(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(stamp).mkString("[", ",", "]")
      else s"${f.getName}:${f.length}:${f.lastModified}"
    val src = fixtureInputs
      .map(t => new java.io.File(s"$dir/$t.parquet"))
      .map(f => if (f.exists) stamp(f) else "absent")
    // The adapter SQL is part of the key: editing a definition must not
    // serve parquet materialized from the previous text.
    val defs = adapters.map { case (n, sql) => s"$n=$sql" }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest((dir +: src ++: defs).mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Materialization cache root. User-scoped (`graft-dsport-<user>`) so a
    * multi-user host can't serve one user's leftover directory to another
    * or fail the atomic publish on foreign permissions (ADVICE r10);
    * overridable via `-Dgraft.dsport.cache.dir` for tests or deliberate
    * shared-cache setups. */
  private[graft] def cacheBaseDir: java.io.File = {
    val user = sys.props.getOrElse("user.name", "nouser")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    new java.io.File(sys.props.getOrElse("graft.dsport.cache.dir",
      new java.io.File(new java.io.File(sys.props("java.io.tmpdir")),
        s"graft-dsport-$user").getAbsolutePath))
  }

  private def readFile(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  private def writeFile(f: java.io.File, s: String): Unit =
    java.nio.file.Files.write(f.toPath, s.getBytes("UTF-8"))

  private def loadManifest(root: java.io.File): Seq[Mat] =
    readFile(new java.io.File(root, "_ORDER")).split("\n").toSeq.map { n =>
      Mat(n, new java.io.File(root, n).getAbsolutePath,
        DataType.fromJson(readFile(new java.io.File(root, s"$n.schema")))
          .asInstanceOf[StructType])
    }

  private def materialize(s: SparkSession, dir: String): Seq[Mat] = {
    val key = fingerprint(dir)
    val root = new java.io.File(cacheBaseDir, key)
    def onDisk = new java.io.File(root, "_DONE").exists()
    // The memo is keyed by the RESOLVED root (not the bare fingerprint):
    // cacheBaseDir is a live sys-prop, and a fingerprint-only key would
    // keep serving paths under the PREVIOUS base after the override
    // changes (the _DONE revalidation below checks the new base, so it
    // would pass while the manifest still points at the old one).
    val memoKey = root.getAbsolutePath
    // Revalidate a memory hit against disk: the documented cold-rebuild
    // recipe is `rm -rf /tmp/graft-dsport-$USER`, and a live session must
    // recover from it by re-materializing, not serve dead paths forever.
    if (materialized.containsKey(memoKey) && !onDisk) materialized.remove(memoKey)
    materialized.computeIfAbsent(memoKey, _ => {
      if (!onDisk) {
        val tmp = new java.io.File(root.getParentFile,
          s"${root.getName}.tmp-${java.util.UUID.randomUUID()}")
        tmp.mkdirs()
        var published = false
        try {
          Tables.register(s, dir, fixtureInputs: _*)
          adapters.foreach { case (tdName, sql) =>
            val df = s.sql(sql) // analyzed against current bindings, eagerly
            val out = new java.io.File(tmp, tdName).getAbsolutePath
            val parts = if (heavyTables(tdName)) 8 else 1
            df.repartition(parts).write.mode("overwrite").parquet(out)
            val stored = s.read.parquet(out)
            // later adapters derive from the STORED output, not a re-derivation
            stored.createOrReplaceTempView(tdName)
            writeFile(new java.io.File(tmp, s"$tdName.schema"), stored.schema.json)
          }
          writeFile(new java.io.File(tmp, "_ORDER"), adapters.map(_._1).mkString("\n"))
          writeFile(new java.io.File(tmp, "_DONE"), "")
          // atomic publish; lose gracefully if a concurrent JVM won the race
          try {
            java.nio.file.Files.move(tmp.toPath, root.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            published = true
          } catch { case _: java.nio.file.FileSystemException =>
            if (!onDisk) throw new IllegalStateException(
              s"DsPort cache publish failed and $root is incomplete")
          }
        } finally {
          // A failed or losing-race build must not leak fixture-scale
          // partial parquet under /tmp.
          if (!published && tmp.exists())
            org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        }
      }
      loadManifest(root)
    })
  }

  private[graft] def register(s: SparkSession, dir: String): Unit =
    graft.engine.CatalogState.bindIfNeeded(s, s"tpcds:$dir") {
      materialize(s, dir).foreach { m =>
        val df = s.read.schema(m.schema).parquet(m.path)
        df.createOrReplaceTempView(m.name)
        if (m.name != "td_seq625" && m.name != "td_dd" && m.name != "td_fact")
          df.createOrReplaceTempView(m.name.stripPrefix("td_"))
      }
    }

  private val prelude: String =
    adapters.map { case (n, sql) => s"$n AS ($sql)" }.mkString(",\n")

  private def oracleize(body: String): String = {
    val b = rename(body).trim
    if (b.toLowerCase.startsWith("with "))
      s"WITH $prelude,\n${b.substring(5)}"
    else
      s"WITH $prelude\n$b"
  }

  /** [[rename]] tracks literal boundaries by splitting on every single
    * quote. `''` pairs (escaped quote or empty literal, d84's
    * `coalesce(c_last_name, '')`) are parity-NEUTRAL under that scheme:
    * the segment between adjacent quotes is empty, so the even-parity
    * slot rename() would rewrite contains nothing, and every non-empty
    * literal segment keeps odd parity — escaped quotes therefore cannot
    * corrupt the rename. The one genuine hazard is a LONE apostrophe in
    * a `--` comment, which flips parity for the rest of the body and
    * renames table tokens INSIDE later string literals (ADVICE r09).
    * Enforce that invariant at construction so a future body violating
    * it fails loudly with its query name instead. */
  private lazy val bodies: Seq[(String, String)] = {
    val all = DsPortBodies1.bodies ++ DsPortBodies2.bodies ++
      DsPortBodies3.bodies ++ DsPortBodies4.bodies
    all.foreach { case (name, body) =>
      var parity = 0
      var i = 0
      while (i < body.length) {
        body.charAt(i) match {
          case '\'' => parity ^= 1; i += 1
          case '-' if parity == 0 && i + 1 < body.length &&
              body.charAt(i + 1) == '-' =>
            val eol = body.indexOf('\n', i) match { case -1 => body.length; case e => e }
            require(!body.substring(i, eol).contains("'"),
              s"$name: apostrophe in a -- comment would break rename(): " +
                body.substring(i, eol))
            i = eol
          case '/' if parity == 0 && i + 1 < body.length &&
              body.charAt(i + 1) == '*' =>
            // Same hazard as `--` comments, block form: rename() doesn't
            // know about comments, so a lone apostrophe inside /* */
            // would flip its quote parity for the rest of the body
            // (latent — no current body uses block comments; ADVICE r10).
            val end = body.indexOf("*/", i + 2) match {
              case -1 => body.length; case e => e + 2
            }
            require(!body.substring(i, end).contains("'"),
              s"$name: apostrophe in a /* */ comment would break rename(): " +
                body.substring(i, end))
            i = end
          case _ => i += 1
        }
      }
    }
    all
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) =>
      name -> ((s: SparkSession, dir: String) => {
        register(s, dir)
        s.sql(body)
      })
    }.toMap

  val oracles: Map[String, String] =
    bodies.map { case (name, body) => name -> oracleize(body) }.toMap
}
