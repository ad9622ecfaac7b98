package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Caching a hot relation must route subsequent plans through
  * InMemoryRelation without changing results — the reuse path for
  * iterative pipelines (e.g. an LSH corpus probed by many query batches).
  */
class CacheSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cached table scans InMemoryRelation and keeps results identical") {
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"), col("n_chars"))
    val before = docs.agg(sum(col("n_chars"))).head().getLong(0)
    val cached = docs.cache()
    try {
      cached.count() // materialize
      val plan = cached.queryExecution.withCachedData.toString
      assert(plan.contains("InMemoryRelation"), plan)
      val after = cached.agg(sum(col("n_chars"))).head().getLong(0)
      assert(after == before)
    } finally cached.unpersist()
  }
}
