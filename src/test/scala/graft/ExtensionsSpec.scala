package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sessions built through GraftSession get every custom Catalyst function
  * via SparkSessionExtensions — no imperative register() call needed.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("injected functions are SQL-callable on a GraftSession build") {
    val sig = spark.sql("SELECT simhash64(array('alpha','beta')) AS s")
      .head().getLong(0)
    val sig2 = spark.sql("SELECT simhash64(array('alpha','beta')) AS s")
      .head().getLong(0)
    assert(sig == sig2, "simhash64 not deterministic")
    val bucket = spark.sql(
      "SELECT hyperplane_lsh(array(cast(0.5 AS float), cast(-1.0 AS float)), 4, 42) AS b")
      .head().getInt(0)
    assert(bucket >= 0 && bucket < 16)
    val asum = spark.sql("SELECT ascii_sum('ab') AS a").head().getLong(0)
    assert(asum == 97L + 98L)
    val mh = spark.sql(
      "SELECT size(minhash_signature(array('a','b','c','d','e','f'), 5, 8)) AS n")
      .head().getInt(0)
    assert(mh == 8)
  }
}
