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
}
