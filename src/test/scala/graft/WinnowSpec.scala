package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExpressions.WinnowFingerprints

/** Winnowing fingerprint guarantees (Schleimer et al., SIGMOD'03): any
  * substring of length >= k+w-1 shared between two documents contributes at
  * least one shared fingerprint; disjoint-alphabet documents share none.
  */
class WinnowSpec extends AnyFunSuite {

  private def fp(s: String, k: Int = 5, w: Int = 4): Set[Long] =
    WinnowFingerprints(Literal(s), k, w).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSet

  test("identical text gives identical fingerprints") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(fp(s) == fp(s))
    assert(fp(s).nonEmpty)
  }

  test("a shared run of length >= k+w-1 guarantees a shared fingerprint") {
    val shared = "abcdefgh" // length 8 = k+w-1 with k=5, w=4
    val a = s"xxxxxxxxxxxx $shared qqqqqqqqqq"
    val b = s"zzzzzz $shared ppppppppppppppp"
    assert(fp(a).intersect(fp(b)).nonEmpty,
      "winnowing guarantee violated: shared substring produced no shared fingerprint")
  }

  test("disjoint-alphabet documents share nothing; density ≈ 2/(w+1)") {
    val a = fp("aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj")
    val b = fp("kkkk llll mmmm nnnn oooo pppp qqqq rrrr ssss tttt")
    assert(a.intersect(b).isEmpty)
    // Selection density sanity: far fewer fingerprints than k-grams.
    val text = ("x" * 200).zipWithIndex.map { case (_, i) => ('a' + i % 26).toChar }.mkString
    val grams = text.length - 5 + 1
    assert(fp(text).size < grams / 2, s"${fp(text).size} of $grams grams selected")
  }

  test("short text (under k bytes) yields an empty fingerprint set") {
    assert(fp("abc") == Set.empty[Long])
  }
}
