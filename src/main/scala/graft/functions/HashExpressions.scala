package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.SparkSession

/** Custom Catalyst expressions for the hash-sketch operators Spark lacks as
  * built-ins (SURVEY.md §7 "custom Expression beats UDF"): SimHash and
  * random-hyperplane LSH. Both are per-row, deterministic, and serializable,
  * so they distribute like any other expression — no driver-side state.
  */
object HashExpressions {

  /** splitmix64 — public-domain mixing function (Steele et al.), the standard
    * way to derive independent pseudo-random streams from integer coordinates.
    */
  @inline private[functions] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private[functions] def hash64(bytes: Array[Byte]): Long = {
    // Two independent 32-bit murmurs combined into 64 bits; self-contained
    // (scala.util.hashing), deterministic across JVMs.
    val lo = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val hi = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** 64-bit SimHash over an array<string> of tokens: per-token 64-bit hash,
    * per-bit ±1 vote, sign of each bit-sum forms the signature. Near-dup
    * docs ⇒ small hamming distance (`bit_count(a ^ b)`).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = hash64(arr.getUTF8String(i).getBytes)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** Random-hyperplane LSH bucket id for an array<float|double> embedding:
    * `nBits` pseudo-random ±1 hyperplanes (derived from (seed, bit, dim) via
    * splitmix64 — no stored model), bucket bit = sign of the projection.
    * Cosine-similar vectors land in the same bucket with high probability,
    * turning ANN search into an equi-join on bucket id (SURVEY.md §7
    * "LSH-bucketed variant as the scale path").
    */
  case class HyperplaneLsh(child: Expression, nBits: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    require(nBits >= 1 && nBits <= 32, s"nBits=$nBits out of range [1,32]")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hyperplane_lsh"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      val n = arr.numElements()
      var bucket = 0
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var i = 0
        while (i < n) {
          val v = elemType match {
            case FloatType => arr.getFloat(i).toDouble
            case _ => arr.getDouble(i)
          }
          // ±1 weight from the (seed, bit, dim) coordinate hash
          val w = if ((splitmix64(seed * 1000003L + b.toLong * 10007L + i) & 1L) == 1L) 1.0 else -1.0
          s += v * w
          i += 1
        }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      java.lang.Integer.valueOf(bucket)
    }

    override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
  }

  /** Register SQL-callable forms on a session; `Column` accessors below go
    * through the registry so they work on any Spark build without relying on
    * non-public Column constructors.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "hyperplane_lsh",
      exprs => {
        val bits = exprs(1).eval(InternalRow.empty).asInstanceOf[Int]
        val seed = exprs(2).eval(InternalRow.empty) match {
          case i: Int => i.toLong
          case l: Long => l
        }
        HyperplaneLsh(exprs.head, bits, seed)
      },
      "scala_udf")
  }

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  def hyperplaneLsh(vec: Column, nBits: Int, seed: Long): Column =
    call_function("hyperplane_lsh", vec,
      org.apache.spark.sql.functions.lit(nBits), org.apache.spark.sql.functions.lit(seed))
}
