package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.functions.HashExpressions

/** ScalaCheck properties for the hash kernels — pure JVM, no Spark session,
  * so hundreds of generated cases run in milliseconds.
  */
object HashProperties extends Properties("graft.hash") {

  private def arr(tokens: Seq[String]) =
    new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])

  private val token: Gen[String] =
    Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private def shingles(tokens: Seq[String], n: Int): Set[Seq[String]] =
    if (tokens.size < n) Set.empty else tokens.sliding(n).map(_.toSeq).toSet

  property("minhash est-jaccard tracks true shingle jaccard within 0.3 at k=128") =
    Prop.forAll(Gen.listOfN(40, token), Gen.listOfN(40, token),
      Gen.choose(0, 40)) { (a, b, overlap) =>
      // Construct docs sharing a prefix of `overlap` tokens.
      val docA = a
      val docB = a.take(overlap) ++ b.drop(overlap)
      val (sa, sb) = (shingles(docA, 5), shingles(docB, 5))
      val union = (sa ++ sb).size
      (union > 0) ==> {
        val trueJ = sa.intersect(sb).size.toDouble / union
        val k = 128
        val ma = HashExpressions.minhashMinima(arr(docA), 5, k)
        val mb = HashExpressions.minhashMinima(arr(docB), 5, k)
        val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / k
        math.abs(est - trueJ) <= 0.3
      }
    }

  property("minhash signature is deterministic and length-k") =
    Prop.forAll(Gen.listOfN(12, token)) { tokens =>
      val m1 = HashExpressions.minhashMinima(arr(tokens), 3, 16)
      val m2 = HashExpressions.minhashMinima(arr(tokens), 3, 16)
      m1.sameElements(m2) && m1.length == 16
    }

  property("identical docs have identical signatures; est-jaccard 1.0") =
    Prop.forAll(Gen.listOfN(20, token)) { tokens =>
      // Two INDEPENDENTLY-built equal docs (defensive copies), and the
      // estimate the title promises is actually computed.
      val m1 = HashExpressions.minhashMinima(arr(tokens.map(identity)), 5, 64)
      val m2 = HashExpressions.minhashMinima(arr(List(tokens: _*)), 5, 64)
      val est = m1.zip(m2).count { case (x, y) => x == y }.toDouble / 64
      est == 1.0
    }

  property("AsciiSum equals the reference byte sum for ASCII strings") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val got = HashExpressions.AsciiSum(Literal(s)).eval(null)
        .asInstanceOf[Long]
      got == s.getBytes("UTF-8").map(_ & 0xFF).map(_.toLong).sum
    }

  property("winnowing: shared run of k+w-1 chars always yields a shared fingerprint") =
    Prop.forAll(Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString),
      Gen.listOfN(30, Gen.numChar).map(_.mkString),
      Gen.listOfN(8, Gen.alphaUpperChar).map(_.mkString)) { (pre, post, shared) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      def fp(s: String) = HashExpressions.WinnowFingerprints(Literal(s), 5, 4)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSet
      // shared is 8 uppercase chars = k+w-1; pre/post alphabets disjoint
      // from it, so any common fingerprint must come from the shared run.
      fp(pre + shared + pre).intersect(fp(post + shared + post)).nonEmpty
    }

  property("ByteStride keeps every n-th byte exactly") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte)),
      Gen.choose(1, 7)) { (bytes, n) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.BinaryType
      val arr = bytes.toArray
      val out = HashExpressions.ByteStride(Literal(arr, BinaryType), n)
        .eval(null).asInstanceOf[Array[Byte]]
      out.length == (arr.length + n - 1) / n &&
        out.zipWithIndex.forall { case (b, i) => b == arr(i * n) }
    }

  property("SimHash64 invariant under token order (bag semantics)") =
    Prop.forAll(Gen.listOfN(10, token)) { tokens =>
      val h1 = HashExpressions.SimHash64(Literal.create(null)).nullSafeEval(arr(tokens))
      val h2 = HashExpressions.SimHash64(Literal.create(null)).nullSafeEval(arr(tokens.reverse))
      h1 == h2
    }
}
