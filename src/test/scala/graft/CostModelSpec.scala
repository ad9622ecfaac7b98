package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.tools.CostModel

/** The static cost model must rank plans the way the reference's
  * complexity algebra does (complexity_cpu.rs): quadratic joins flagged,
  * filters shrinking downstream estimates, sort super-linear, and the
  * task-count recommendation growing with input size — all WITHOUT
  * executing anything.
  */
class CostModelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def li(dir: String) = Tables.load(spark, dir, "lineitem")
  private def ord(dir: String) = Tables.load(spark, dir, "orders")

  test("filter reduces estimated rows; scan estimate is order-correct") {
    val base = CostModel.totalCost(li(sf01))
    val filtered = CostModel.totalCost(li(sf01).filter(col("l_quantity") > 40))
    assert(filtered.rows < base.rows,
      s"filter did not shrink estimate: ${filtered.rows} !< ${base.rows}")
    // sf0.01 lineitem is ~60k rows; the static estimate must be within
    // 100x either way (the model's stated contract is order of magnitude).
    val actual = li(sf01).count().toDouble
    assert(base.rows > actual / 100 && base.rows < actual * 100,
      s"scan estimate ${base.rows} vs actual $actual off by >100x")
  }

  test("theta join is flagged quadratic and costed above the equi join") {
    val l = li(sf01).select(col("l_orderkey"), col("l_quantity"))
    val o = ord(sf01).select(col("o_orderkey"), col("o_totalprice"))
    val equi = l.join(o, col("l_orderkey") === col("o_orderkey"))
    val theta = l.join(o, col("l_quantity") < col("o_totalprice"))
    val ce = CostModel.totalCost(equi)
    val ct = CostModel.totalCost(theta)
    assert(!ce.quadratic, "equi join wrongly flagged quadratic")
    assert(ct.quadratic, "theta join not flagged quadratic")
    assert(ct.cpu > 10 * ce.cpu,
      s"theta cpu ${ct.cpu} not clearly above equi cpu ${ce.cpu}")
  }

  test("sort costs super-linearly; aggregate shrinks cardinality") {
    val scan = CostModel.totalCost(li(sf01))
    val sorted = CostModel.totalCost(li(sf01).orderBy(col("l_quantity")))
    assert(sorted.cpu > scan.cpu * 2,
      s"sort cpu ${sorted.cpu} not super-linear over scan ${scan.cpu}")
    val agg = CostModel.totalCost(
      li(sf01).groupBy(col("l_orderkey")).agg(sum(col("l_quantity"))))
    assert(agg.rows < scan.rows, "aggregate did not reduce cardinality")
  }

  test("recommended shuffle partitions scale with input size, clamped >= 1") {
    val small = CostModel.recommendShufflePartitions(li(sf001),
      bytesPerTask = 64 * 1024)
    val large = CostModel.recommendShufflePartitions(li(sf01),
      bytesPerTask = 64 * 1024)
    assert(small >= 1 && large >= 1)
    assert(large > small,
      s"10x input did not raise the recommendation ($small -> $large)")
    // Clamps hold at the extremes.
    assert(CostModel.recommendShufflePartitions(li(sf01),
      bytesPerTask = Long.MaxValue) == 1)
    assert(CostModel.recommendShufflePartitions(li(sf01),
      bytesPerTask = 1, maxTasks = 17) == 17)
  }

  test("report renders every node and the recommendation") {
    val r = CostModel.report(
      li(sf001).filter(col("l_quantity") > 10)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n")))
    assert(r.contains("Aggregate") && r.contains("Filter"))
    assert(r.contains("recommended shuffle partitions"))
  }
}
