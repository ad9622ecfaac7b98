package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Degenerate-shape parity with the reference's edge tests
  * (`tests/empty_columns_between_workers.rs`): zero-column rows and empty
  * relations must flow through exchanges, aggregations, and joins without
  * corruption — row COUNTS are data even when no column is.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fixture-drift normalization: ts encodings and embedding element types") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // nanos-as-long legacy encoding -> µs-truncated TimestampType
    val nanos = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val fromNanos = Tables.normalizeEventTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000123456L)
    // TIMESTAMP_NTZ (the round-7 regenerated encoding) -> TimestampType,
    // same instant under the UTC session tz
    val ntz = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(1700000000123456L))
        .cast(TimestampNTZType))
    val fromNtz = Tables.normalizeEventTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000123456L)
    // no ts column, already-correct type: both pass through untouched
    assert(Tables.normalizeEventTs(Seq(1L).toDF("x")).schema ==
      Seq(1L).toDF("x").schema)
    assert(Tables.normalizeEventTs(fromNtz).schema("ts").dataType ==
      TimestampType)
    // embeddings drifted to numpy-default array<double> + int32 ids: the
    // typed vector kernels need array<float> and long ids
    val drifted = Seq((1, Seq(1.5d, 2.5d), 0)).toDF("vec_id", "embedding", "label")
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    drifted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val loaded = Tables.load(spark, dir, "embeddings")
    assert(loaded.schema("embedding").dataType == ArrayType(FloatType))
    assert(loaded.schema("vec_id").dataType == LongType)
    assert(loaded.select(col("embedding")(0)).head().getFloat(0) == 1.5f)
  }

  test("zero-column rows survive a repartition exchange with exact cardinality") {
    val n = 4321L
    import spark.implicits._
    val zeroCols = (0L until n).toDF("v").select()
    assert(zeroCols.columns.isEmpty, "projection must drop every column")
    // The exchange ships rows that serialize to nothing but their count.
    assert(zeroCols.repartition(8).count() == n)
  }

  test("empty relations through agg, join, union, and window yield empty — never errors") {
    val li = Tables.load(spark, sf001, "lineitem")
    val empty = li.filter(lit(false))
    assert(empty.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity"))).count() == 0)
    // Global agg over empty input is ONE row (SQL semantics), not zero.
    val row = empty.agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      .collect()(0)
    assert(row.getLong(0) == 0L && row.isNullAt(1))
    assert(empty.join(li, Seq("l_orderkey")).count() == 0)
    assert(li.join(empty.select(col("l_orderkey").as("k")),
      col("l_orderkey") === col("k"), "left_semi").count() == 0)
    assert(empty.unionByName(empty).count() == 0)
    import org.apache.spark.sql.expressions.Window
    assert(empty.withColumn("rn",
      row_number().over(Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber")))).count() == 0)
  }

  test("all-null key columns aggregate into the single null group") {
    val li = Tables.load(spark, sf001, "lineitem").limit(100)
    val nulled = li.withColumn("k", lit(null).cast("long"))
    val groups = nulled.groupBy(col("k")).agg(count(lit(1)).as("n")).collect()
    assert(groups.length == 1 && groups(0).isNullAt(0) && groups(0).getLong(1) == 100L)
  }

  test("round-6 operators on degenerate input: empty corpus, no bigrams, null ids") {
    import spark.implicits._
    import graft.operators.{Sampling, TextOps}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // filterFunnel on an empty corpus: five all-zero stages, no nulls.
    val funnel = TextOps.filterFunnel(empty, "doc_id", "text")
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(funnel.length == 5 && funnel.forall(t => t._2 == 0L && t._3 == 0L),
      s"empty funnel must be all zeros: ${funnel.toSeq}")
    // importanceWeights when NO document has two tokens (model is empty):
    // empty typed result, not an NPE on the null model scalars.
    val short = Seq((1L, "solo"), (2L, "x")).toDF("doc_id", "text")
    val iw = TextOps.importanceWeights(short, "doc_id", "text", lit(true))
    assert(iw.count() == 0 &&
      iw.columns.toSeq == Seq("id", "n_bigrams", "llr_micro", "dsir_logratio"))
    assert(TextOps.importanceWeights(empty, "doc_id", "text", lit(true))
      .count() == 0)
    // deterministicShuffle: a null id has no position — loud failure.
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Sampling.deterministicShuffle(withNull, "id").collect()
    }
    assert(e.getMessage.contains("null"), e.getMessage)
    // Empty input shuffles to an empty permutation.
    assert(Sampling.deterministicShuffle(empty.select(col("doc_id").as("id")),
      "id").count() == 0)
    // cdcChunks drops null/empty-token docs instead of erroring.
    val nullText = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(TextOps.cdcChunks(nullText, "doc_id", "text", 16)
      .select(col("id")).distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
