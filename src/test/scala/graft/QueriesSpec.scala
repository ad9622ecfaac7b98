package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run at sf0.01, return rows, and keep a
  * stable, fully-named schema (the driver's DuckDB compare sorts columns by
  * name — an auto-generated name like `sum(x)` would silently break it).
  * Mirrors the reference's all-queries correctness runner
  * (`/root/reference/tests/tpch_correctness_test.rs:139-158`).
  */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val autoNamed = """.*[()].*""".r

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs, returns rows, schema is stable") {
      val df = fn(spark, sf01)
      val fields = df.schema.fields
      assert(fields.nonEmpty, "empty schema")
      fields.foreach { f =>
        assert(autoNamed.unapplySeq(f.name).isEmpty,
          s"auto-generated column name '${f.name}' — alias it explicitly")
      }
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows at sf0.01")
    }
  }

  test("every query has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Every query is oracled — p12 (the last holdout) now uses axis-sign
    // LSH buckets that DuckDB recomputes, so even the approximate ANN
    // answer is differentially verified.
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }
}
