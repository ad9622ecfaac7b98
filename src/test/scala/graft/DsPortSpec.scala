package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the TPC-DS adapter-schema invariants ([[graft.queries.DsPort]])
  * that the d01–d99 verbatim port rests on. Each of these has a concrete
  * failure mode found during the round-9 build:
  *
  *  - the channel slice fixes `(l_orderkey + l_linenumber) % 3`, so any
  *    per-channel key formula with a modulus sharing a factor of 3
  *    collapses to a third of its domain (the original `% 12` store key
  *    left stores {1,2,4,5,7,8,10,11} unsellable — q1/q24/q44 starved);
  *  - money columns must be integer-valued doubles: integer-valued sums
  *    are exact in both engines, and the explicit `* 1e0` stops Spark's
  *    BIGINT `floor` from promoting to DECIMAL under `*1.0000` literals;
  *  - store zips must lie inside the address-zip progression or q24's
  *    `s_zip = ca_zip` equi-join is empty at every SF.
  */
class DsPortSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = sf001

  private def view(name: String) = {
    graft.queries.DsPort.register(spark, dir)
    spark.table(name)
  }

  test("calendar: dense 2922-day range anchored on Sunday 1995-01-01") {
    val dd = view("date_dim")
    assert(dd.count() == 2922)
    assert(dd.select(countDistinct(col("d_date_sk"))).head.getLong(0) == 2922)
    val first = dd.orderBy("d_date_sk")
      .select("d_date", "d_dow", "d_week_seq", "d_month_seq").head
    assert(first.get(0).toString == "1995-01-01")
    assert(first.getInt(1) == 0, "1995-01-01 must be d_dow 0 (Sunday)")
    assert(first.getInt(3) == 1200, "d_month_seq anchor is 1200 = 1995-01")
  }

  test("channels partition lineitem and cover every store/site key") {
    val ss = view("store_sales").count()
    val cs = view("catalog_sales").count()
    val ws = view("web_sales").count()
    val li = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(ss + cs + ws == li, "the three channels must partition lineitem")
    // The mod-3 lockstep regression: within one channel the %12 key must
    // still reach all 12 values.
    val stores = view("store_sales")
      .select(countDistinct(col("ss_store_sk"))).head.getLong(0)
    assert(stores == 12, s"store key collapsed to $stores of 12 values")
    val sites = view("web_sales")
      .select(countDistinct(col("ws_web_site_sk"))).head.getLong(0)
    assert(sites == 12, s"web-site key collapsed to $sites of 12 values")
  }

  test("every money column is an integer-valued double") {
    val moneyCols = Map(
      "store_sales" -> Seq("ss_list_price", "ss_sales_price",
        "ss_ext_sales_price", "ss_ext_list_price", "ss_ext_tax",
        "ss_coupon_amt", "ss_net_paid", "ss_net_profit"),
      "store_returns" -> Seq("sr_return_amt", "sr_refunded_cash",
        "sr_net_loss", "sr_return_amt_inc_tax"),
      "catalog_sales" -> Seq("cs_ext_ship_cost", "cs_net_paid_inc_tax"),
      "item" -> Seq("i_current_price", "i_wholesale_cost"))
    moneyCols.foreach { case (table, cols) =>
      val df = view(table)
      cols.foreach { c =>
        assert(df.schema(c).dataType.typeName == "double",
          s"$table.$c must be double, was ${df.schema(c).dataType}")
        val frac = df.filter(col(c) =!= floor(col(c))).count()
        assert(frac == 0, s"$table.$c has $frac non-integer values")
      }
    }
  }

  test("adapter tables are stored scans, not per-query derivations") {
    // r10: register materializes the 27 adapter outputs to parquet once
    // per fixture dir. A regression back to view-backed derivation would
    // re-run the lineitem ⋈ orders ⋈ calendar join on every fact
    // reference (the r09 d49 pathology) — pin the plan shape: a bare
    // fact-table read must be a single relation with no join below it.
    graft.queries.DsPort.register(spark, dir)
    Seq("store_sales", "catalog_returns", "inventory").foreach { t =>
      val plan = spark.table(t).queryExecution.optimizedPlan.toString
      assert(!plan.toLowerCase.contains("join"),
        s"$t is not a stored scan:\n${plan.take(400)}")
    }
    // Idempotent: re-register rebinds the same stored data.
    val n1 = spark.table("store_sales").count()
    graft.queries.DsPort.register(spark, dir)
    assert(spark.table("store_sales").count() == n1)
    // Cold-rebuild recovery: the documented recipe deletes the on-disk
    // cache under a LIVE session; the next register must re-materialize
    // rather than serve dead paths from the in-memory map. Run the
    // DESTRUCTIVE part against a PRIVATE cache base (the sys-prop
    // override) — deleting the shared default base nukes it out from
    // under any concurrently running graft JVM on the same machine (this
    // exact race broke a Verify run that overlapped `sbt test` in r13).
    val privBase =
      java.nio.file.Files.createTempDirectory("graft-dsport-spec").toFile
    val prevBase = sys.props.get("graft.dsport.cache.dir")
    try {
      sys.props("graft.dsport.cache.dir") = privBase.getAbsolutePath
      graft.engine.CatalogState.invalidate(spark)
      graft.queries.DsPort.register(spark, dir) // materialize into privBase
      org.apache.commons.io.FileUtils.deleteDirectory(privBase)
      graft.engine.CatalogState.invalidate(spark)
      graft.queries.DsPort.register(spark, dir)
      assert(spark.table("store_sales").count() == n1,
        "register must recover from rm -rf of the materialization cache")
    } finally {
      prevBase match {
        case Some(v) => sys.props("graft.dsport.cache.dir") = v
        case None => sys.props.remove("graft.dsport.cache.dir")
      }
      if (privBase.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(privBase)
      // Rebind views to the default-base materialization for later tests.
      graft.engine.CatalogState.invalidate(spark)
      graft.queries.DsPort.register(spark, dir)
    }
  }

  test("store zips lie inside the address-zip progression (q24 join)") {
    val caZips = view("customer_address")
      .select("ca_zip").distinct().collect().map(_.getString(0)).toSet
    val sZips = view("store").select("s_zip").collect().map(_.getString(0))
    val missing = sZips.filterNot(caZips)
    // Stores 8-11 intentionally fall outside (their 13+35k zips exceed the
    // 40-value window); the joinable subset must be the first eight.
    assert(sZips.take(8).forall(caZips),
      s"store zips outside the address progression: ${missing.mkString(",")}")
  }

  test("ss_addr_sk: ~5% NULL and sometimes differs from the current address") {
    val ss = view("store_sales")
    val n = ss.count().toDouble
    val nulls = ss.filter(col("ss_addr_sk").isNull).count()
    assert(nulls > 0 && nulls / n < 0.10, s"NULL share ${nulls / n}")
    val diff = ss.join(view("customer"),
        col("ss_customer_sk") === col("c_customer_sk"))
      .filter(col("ss_addr_sk").isNotNull &&
        col("ss_addr_sk") =!= col("c_current_addr_sk")).count()
    assert(diff > 0, "q46/q68 need bought-elsewhere rows")
  }
}
