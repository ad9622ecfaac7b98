package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Bulk plan audit: executes every query and flags plans containing the
  * operators that are pathological at scale — cartesian products and
  * broadcast nested-loop joins — except where the query's semantics ARE a
  * cross/theta join (exempt list below). Exit summary per query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", "graft-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Queries whose SEMANTICS are a cross/nested-loop join — exempt.
    // p17 compares GROUP-level sketches pairwise: quadratic in the number
    // of groups (sources), not rows — the input relation is the aggregate.
    // p27 crossJoins every row against the BROADCAST per-label centroid
    // table (|labels| rows by construction) — nearest-prototype assignment
    // is a scan × tiny-constant, not a quadratic join.
    // q89 cross-joins eight SINGLE-ROW scalar aggregates (the TPC-DS q88
    // shape): every BroadcastNestedLoopJoin build side is exactly one row,
    // so the "nested loop" is 8 constant-cost merges, not a quadratic join.
    val crossByDesign = Set("q27_inequality_join", "q28_cross_join",
      "q29_scalar_subquery", "p07_jaccard_pairs", "p10_embedding_topk",
      "p13_embedding_near_pairs", "p17_source_similarity",
      "q26_null_aware_anti", "p27_centroid_confusion", "q89_hour_buckets")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"))
          .collect { case (f, true) => f }
        val verdict =
          if (flags.isEmpty) "ok"
          else if (crossByDesign(name)) s"ok (by design: ${flags.mkString(",")})"
          else s"FLAG: ${flags.mkString(",")}"
        println(f"[audit] $name%-30s $verdict")
      } catch {
        // String.valueOf: getMessage is null for bare NPEs etc. — the
        // handler must not itself throw and abort the remaining audits.
        case e: Throwable =>
          println(f"[audit] $name%-30s ERROR ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    spark.stop()
  }
}
