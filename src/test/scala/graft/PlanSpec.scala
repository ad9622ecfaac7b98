package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape snapshot tests (the reference's `tests/tpch_plans_test.rs`
  * analog): assert the physical plans we rely on for scale — filter
  * pushdown to the parquet scan, two-phase aggregation, broadcast vs
  * shuffle join choice — so a regression (an unpushed filter, a lost
  * broadcast) fails CI instead of silently costing 100× at scale.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf001)
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q01: two-phase hash aggregation with pushed scan filter") {
    val plan = executedPlan("q01_pricing_summary")
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      plan.contains("LessThanOrEqual(l_shipdate"), plan)
  }

  test("q03: predicate pushdown reaches every scan") {
    val plan = executedPlan("q03_shipping_priority")
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q05: dimension tables broadcast; no cartesian anywhere") {
    // At sf0.001 AQE legitimately broadcasts the small fact sides too, so
    // asserting a shuffle join here would pin tiny-scale behavior. The
    // scale-invariant properties: dims ARE broadcast, the agg shuffles on
    // its keys, and nothing degenerates to a cartesian product.
    val plan = executedPlan("q05_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q02 topk compiles to TakeOrderedAndProject (no global sort)") {
    val plan = executedPlan("q02_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("GlobalSort"), plan)
  }

  test("round-robin repartition balances partitions without changing results") {
    import org.apache.spark.sql.functions._
    // coalesce(1) first: round-robin distributes each INPUT partition
    // independently from a random start offset, so max-min <= 1 only holds
    // for a single input partition — with P inputs the legal spread is P.
    val docs = graft.engine.Tables.load(spark, sf001, "documents").coalesce(1)
    val rr = docs.repartition(6)
    assert(rr.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM") ||
      rr.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"),
      rr.queryExecution.executedPlan.toString)
    val sizes = rr.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 6, s"expected 6 partitions, got ${sizes.length}")
    assert(sizes.max - sizes.min <= 1, // round-robin is maximally balanced
      s"round-robin produced skewed partitions: ${sizes.toSeq}")
    assert(rr.count() == docs.count())
  }

  test("q41 left-outer count distribution: preserved-side join, two agg phases") {
    val plan = executedPlan("q41_cust_order_distribution")
    assert(plan.contains("LeftOuter"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q46 double-EXISTS compiles to semi/anti hash joins, not nested loops") {
    val plan = executedPlan("q46_returned_never_huge")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan)
  }

  test("p08 minhash: no cross join anywhere in the dedup plan") {
    val plan = executedPlan("p08_minhash_pairs")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("runtime bloom-filter join pruning is live in the engine's session " +
    "(fires once the 100 TB-scale thresholds are met)") {
    import org.apache.spark.sql.functions._
    import graft.engine.Tables
    // At fleet scale Spark's InjectRuntimeFilter (default-on) builds a
    // bloom filter from a selective join side and prunes the big side's
    // scan BEFORE the shuffle — the native analog of a semi-join
    // reduction, and a large shuffle-volume win on selective fact joins.
    // Its application-side threshold is 10 GB, so it can never fire on
    // test fixtures; this pin lowers the thresholds and proves the
    // engine's conf/extensions do not BLOCK the rule (a regression here
    // silently costs the full fact-scan shuffle at scale).
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "10MB")
      conf.set(keys(1), "1KB")
      conf.set(keys(2), "-1") // force the shuffle join the filter serves
      val l = Tables.load(spark, sf001, "lineitem")
      val o = Tables.load(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") &&
        optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n${optimized.take(800)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
