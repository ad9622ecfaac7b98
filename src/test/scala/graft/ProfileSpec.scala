package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Profile

/** Column profiler: exact stats vs directly-computed per-column answers,
  * null accounting, and the plan shape (no Expand-based distinct — the
  * whole profile is two ordinary hash aggregations).
  */
class ProfileSpec extends AnyFunSuite {
  import SparkTestSession._

  test("profile matches per-column ground truth on documents") {
    val d = Tables.load(spark, sf01, "documents")
    val prof = Profile.profile(d, Seq("doc_id", "lang", "source"))
      .collect().map(r => r.getString(0) -> r).toMap

    val n = d.count()
    Seq("doc_id", "lang", "source").foreach { c =>
      val row = prof(c)
      assert(row.getLong(1) == n, s"$c n_rows")
      assert(row.getLong(2) == d.filter(col(c).isNull).count(), s"$c n_null")
      assert(row.getLong(3) == d.select(col(c)).na.drop().distinct().count(),
        s"$c n_distinct")
      val mm = d.agg(min(col(c).cast("string")), max(col(c).cast("string"))).head()
      assert(row.getString(4) == mm.getString(0), s"$c min")
      assert(row.getString(5) == mm.getString(1), s"$c max")
    }
  }

  test("nulls are counted, excluded from distinct/min/max") {
    import spark.implicits._
    val d = Seq(Some("a"), None, Some("b"), Some("a"), None)
      .toDF("x")
    val r = Profile.profile(d, Seq("x")).head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 2 && r.getLong(3) == 2)
    assert(r.getString(4) == "a" && r.getString(5) == "b")
  }

  test("plan has no Expand and exactly two aggregation levels") {
    val d = Tables.load(spark, sf01, "documents")
    val plan = Profile.profile(d, Seq("doc_id", "lang", "source", "n_chars"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "profile must not use Expand-based distinct aggregation")
    // Two-level plan: one shuffle for (col,value), one for (col).
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 hash exchanges, got $shuffles:\n$plan")
  }

  test("percentRankWithin: per-group scale, shared tie ranks, singleton is 0") {
    import spark.implicits._
    val d = Seq(
      // Group a: values 10,20,20,40 -> pct 0, 1/3, 1/3, 1.
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L), ("a", 4L, 40L),
      // Group b: a single row ranks 0 regardless of its value.
      ("b", 5L, 99999L)).toDF("source", "id", "v")
    val out = Profile.percentRankWithin(d, "source", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(4L) == 1.0 && out(5L) == 0.0)
    assert(out(2L) == out(3L) && math.abs(out(2L) - 1.0 / 3) < 1e-5,
      s"ties must share a rank: $out")
  }

  test("percentRankWithin sorts nulls LAST (matching SQL-standard percent_rank)") {
    import spark.implicits._
    // Spark's default sort is NULLS FIRST, which would hand null values
    // the LOWEST percentiles; the oracle (DuckDB) ranks them last.
    val d = Seq(("a", 1L, Some(10L)), ("a", 2L, Some(20L)),
      ("a", 3L, Option.empty[Long])).toDF("source", "id", "v")
    val out = Profile.percentRankWithin(d, "source", "v")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.5 && out(3L) == 1.0,
      s"null v must take the highest rank, not the lowest: $out")
  }

  test("skewReport surfaces the planted heavy hitter with the right factor") {
    import spark.implicits._
    // 900 rows of key 7 + 100 distinct singleton keys + 10 nulls:
    // 102 distinct keys (null counts), total 1010, mean ≈ 9.902.
    val d = (Seq.fill(900)(Some(7L)) ++ (1000L to 1099L).map(Some(_)) ++
      Seq.fill(10)(Option.empty[Long])).toDF("k")
    val rows = Profile.skewReport(d, "k", k = 3).collect()
    assert(rows.length == 3)
    val top = rows.head
    assert(top.getString(0) == "7" && top.getLong(1) == 900L)
    assert(math.abs(top.getDouble(2) - 900.0 / 1010) < 1e-6)
    assert(top.getDouble(3) > 80.0, // 900 / (1010/102) ≈ 90.9
      s"skew factor must flag the hitter: ${top.getDouble(3)}")
    // Null keys are a reported group (mostly-null join keys ARE skew).
    assert(rows.exists(r => r.isNullAt(0) && r.getLong(1) == 10L))
    // Empty input: empty report, no division by zero.
    assert(Profile.skewReport(d.filter(lit(false)), "k").count() == 0)
  }
}
