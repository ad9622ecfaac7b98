package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.NdvSizing

class NdvSizingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("keyStats measures rows, approximate NDV and null fraction in one pass") {
    import spark.implicits._
    val df = ((1 to 900).map(i => (Some(i % 30), s"v$i")) ++
      (1 to 100).map(i => (None: Option[Int], s"n$i"))).toDF("k", "v")
    val s = NdvSizing.keyStats(df, Seq("k"))
    assert(s.rows == 1000)
    // 30 distinct non-null keys + the null key; HLL rsd 5%.
    assert(s.ndv >= 28 && s.ndv <= 34, s"ndv=${s.ndv}")
    assert(math.abs(s.nullFrac - 0.1) < 1e-9, s"nullFrac=${s.nullFrac}")
  }

  test("keyStats pre-pass scan is pruned to the key columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndv_prune").toString
    (1 to 100).map(i => (i % 7, s"wide_payload_$i", i.toDouble))
      .toDF("k", "payload", "x").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val probe = df.select("k")
      .agg(count(lit(1)), approx_count_distinct(col("k"), 0.05))
    val scan = probe.queryExecution.executedPlan.toString()
    assert(scan.contains("ReadSchema") && scan.contains("struct<k:int>"),
      s"pre-pass must read only the key column:\n$scan")
  }

  test("low NDV takes the plain two-phase path (no forced repartition)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 10, i.toLong)).toDF("k", "x")
    val (out, d) = NdvSizing.sizedAggregate(df, Seq("k"),
      Seq(sum(col("x")).as("s"), count(lit(1)).as("n")))
    assert(!d.repartitioned && d.numPartitions == -1)
    assert(!out.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[RepartitionByExpression]),
      "low-NDV path must not inject a repartition (map-side combine wins)")
    assert(out.count() == 10)
  }

  test("high NDV repartitions on the keys to an NDV-derived partition count") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, 1L)).toDF("k", "x")
    val (out, d) = NdvSizing.sizedAggregate(df, Seq("k"),
      Seq(sum(col("x")).as("s")),
      combineNdvThreshold = 1000L, keysPerPartition = 4096L)
    assert(d.repartitioned, s"decision=$d")
    // ndv≈20000 (±5%), /4096 → 5 partitions at exact measurement.
    assert(d.numPartitions >= 4 && d.numPartitions <= 6,
      s"numPartitions=${d.numPartitions} from ndv=${d.stats.ndv}")
    val reps = out.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression => r
    }
    assert(reps.nonEmpty &&
      reps.head.optNumPartitions.contains(d.numPartitions),
      s"expected key repartition to ${d.numPartitions} partitions")
    assert(out.count() == 20000)
  }

  test("maxPartitions caps the computed fan-out") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, 1L)).toDF("k", "x")
    val (_, d) = NdvSizing.sizedAggregate(df, Seq("k"), Seq(count(lit(1)).as("n")),
      maxPartitions = 2, combineNdvThreshold = 1L, keysPerPartition = 100L)
    assert(d.repartitioned && d.numPartitions == 2)
  }

  test("null-heavy keys are filtered pre-shuffle only when the caller allows") {
    import spark.implicits._
    val df = ((1 to 700).map(i => (Some(i % 5), 1L)) ++
      (1 to 300).map(_ => (None: Option[Int], 1L))).toDF("k", "x")
    val (kept, dKept) = NdvSizing.sizedAggregate(df, Seq("k"),
      Seq(count(lit(1)).as("n")))
    assert(!dKept.droppedNullKeys)
    assert(kept.count() == 6, "null group kept by default")
    val (dropped, dDrop) = NdvSizing.sizedAggregate(df, Seq("k"),
      Seq(count(lit(1)).as("n")), dropNullKeys = true)
    assert(dDrop.droppedNullKeys && dDrop.stats.nullFrac > 0.29)
    assert(dropped.count() == 5, "null group filtered before the shuffle")
  }

  test("sizedEquiJoin broadcasts a measured-small right side") {
    import spark.implicits._
    val left = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "lv")
    val right = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "rv")
    val (out, d) = NdvSizing.sizedEquiJoin(left, right, Seq("k"))
    assert(d.broadcastRight && d.numPartitions == -1)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(out.count() == 5000)
  }

  test("sizedEquiJoin shuffles both sides to an NDV-derived partition count") {
    import spark.implicits._
    val left = (1L to 20000L).map(i => (i, i * 2)).toDF("k", "lv")
    val right = (1L to 20000L).map(i => (i, i * 3)).toDF("k", "rv")
    val (out, d) = NdvSizing.sizedEquiJoin(left, right, Seq("k"),
      broadcastBytes = 1L, keysPerPartition = 4096L)
    assert(!d.broadcastRight)
    assert(d.numPartitions >= 4 && d.numPartitions <= 6,
      s"numPartitions=${d.numPartitions} from ndv=(${d.left.ndv},${d.right.ndv})")
    val reps = out.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression => r
    }
    assert(reps.size == 2 &&
      reps.forall(_.optNumPartitions.contains(d.numPartitions)),
      s"expected both sides repartitioned to ${d.numPartitions}")
    assert(out.count() == 20000)
  }

  test("sizing never changes the answer: both paths agree with plain groupBy") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i % 101, i.toLong)).toDF("k", "x")
    val expected = df.groupBy("k").agg(sum(col("x")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    for (threshold <- Seq(1L, 1000000L)) {
      val (out, _) = NdvSizing.sizedAggregate(df, Seq("k"),
        Seq(sum(col("x")).as("s")), combineNdvThreshold = threshold)
      val got = out.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(got == expected, s"threshold=$threshold diverged")
    }
  }
}
