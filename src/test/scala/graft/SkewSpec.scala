package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("saltedJoin equals the plain join row-for-row on a skewed key") {
    import spark.implicits._
    // Skewed fact: 5000 rows on key 1, a handful elsewhere.
    val fact = (Seq.fill(5000)(1) ++ (2 to 50)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val dim = (1 to 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length,
      s"salted=${salted.length} plain=${plain.length}")
    assert(salted.sameElements(plain))
  }

  test("salting spreads a hot key across multiple partitions, deterministically") {
    import spark.implicits._
    // Content-hash salt (never positional — SPARK-23207): distinct rows of
    // one hot key must land on many salts, and re-evaluation must agree.
    val fact = (1 to 2000).map(i => (1, s"payload_$i")).toDF("k", "v")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(8L)).cast("int"))
    val saltCards = salted.select(countDistinct(col("_salt"))).head().getLong(0)
    assert(saltCards == 8, s"expected 8 distinct salts, got $saltCards")
    val a = salted.collect().map(_.toString).sorted
    val b = salted.collect().map(_.toString).sorted
    assert(a.sameElements(b), "salt must be deterministic across evaluations")
  }

  test("keySkewProfile surfaces the hot key share") {
    import spark.implicits._
    val fact = (Seq.fill(900)(7) ++ (1 to 100)).map(k => (k, "p")).toDF("k", "v")
    val top = Skew.keySkewProfile(fact, "k", topN = 1).head()
    assert(top.getInt(0) == 7)
    assert(top.getDouble(2) > 0.85, s"share was ${top.getDouble(2)}")
  }
}
