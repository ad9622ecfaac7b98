package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.HashExpressions._

/** `SparkSessionExtensions` injector for the engine's custom Catalyst
  * expressions — the standard deployment path
  * (`spark.sql.extensions=graft.engine.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), mirroring
  * how the reference packages its custom operators behind a single
  * session-context builder (`/root/reference/src/distributed_ext.rs:76-120`).
  * Sessions built this way get every `graft` SQL function without any
  * explicit `HashExpressions.register` call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(exprs: Seq[Expression], i: Int): Int =
    exprs(i).eval(InternalRow.empty).asInstanceOf[Int]
  private def longArg(exprs: Seq[Expression], i: Int): Long =
    exprs(i).eval(InternalRow.empty) match {
      case x: Int => x.toLong
      case x: Long => x
    }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.HashExpressions", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => graft.plans.BroadcastGuard(session))
    // Reference PartialReduce analog; inert unless spark.graft.partialReduce
    // is set on the session (off by default, like the reference's).
    ext.injectQueryStagePrepRule(session => graft.plans.PartialReduce(session))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      exprs => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - double dot product of two float/double arrays"),
      exprs => graft.functions.VectorExpressions.dotExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("l2sq_f"),
      info("l2sq_f", "l2sq_f(a, b) - squared L2 distance of two float/double arrays"),
      exprs => graft.functions.VectorExpressions.l2sqExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(tokens, shingleLen, k) - k minhashes over word shingles"),
      exprs => MinHashSignature(exprs.head, intArg(exprs, 1), intArg(exprs, 2))))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(tokens, shingleLen, k, r) - k/r LSH band hashes"),
      exprs => MinHashBandHashes(exprs.head,
        intArg(exprs, 1), intArg(exprs, 2), intArg(exprs, 3))))
    ext.injectFunction((FunctionIdentifier("hyperplane_lsh"),
      info("hyperplane_lsh",
        "hyperplane_lsh(vec, nBits, seed) - random-hyperplane LSH bucket"),
      exprs => HyperplaneLsh(exprs.head, intArg(exprs, 1), longArg(exprs, 2))))
    ext.injectFunction((FunctionIdentifier("ascii_sum"),
      info("ascii_sum", "ascii_sum(str) - sum of UTF-8 byte values"),
      exprs => AsciiSum(exprs.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization"),
      exprs => NfcNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("interleave_bits"),
      info("interleave_bits",
        "interleave_bits(x, y) - Morton/Z-order encode of two 32-bit values"),
      exprs => InterleaveBits(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs(0), org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs(1), org.apache.spark.sql.types.LongType))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(str, k, w) - winnowed k-gram fingerprint set"),
      exprs => WinnowFingerprints(exprs.head, intArg(exprs, 1), intArg(exprs, 2))))
  }
}
