package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native dot-product expression for embedding arrays.
  *
  * The declarative form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates two intermediate arrays and walks boxed lambda evaluators per
  * ROW-PAIR; inside a bucket self-join ([[graft.operators.Similarity]]) the
  * pair count is N×probes×bucketSize, so the kernel dominates the stage.
  * This expression is one allocation-free loop with `doGenCode`, keeping
  * the scoring projection inside whole-stage codegen — same motivation as
  * the reference's vectorized kernels, re-expressed as a Catalyst
  * expression instead of a hand-built operator.
  *
  * Semantics exactly match the HOF form it replaces: elements are cast to
  * double and accumulated LEFT-TO-RIGHT (so results are bit-identical to
  * the previous implementation and to DuckDB's `list_sum(list_transform
  * (list_zip(a,b), x -> x[1]::DOUBLE * x[2]::DOUBLE))` oracle), and the
  * result is NULL when either array is NULL, any element is NULL, or the
  * lengths differ (the HOF form yields NULL in those cases via null
  * propagation through `zip_with` padding).
  */
object VectorExpressions {

  /** Interpreted/codegen shared kernel. Returns a boxed Double or null. */
  def dotJava(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ (aᵢ-bᵢ)², same contract and accumulation order as [[dotJava]]. */
  def l2sqJava(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Shared machinery for the binary array-fold expressions. */
  sealed abstract class ArrayPairFold extends BinaryExpression {
    /** Fully-qualified static kernel, e.g. `...VectorExpressions.dotJava`. */
    protected def kernel: String
    protected def fold(a: ArrayData, b: ArrayData,
                       aF: Boolean, bF: Boolean): java.lang.Double

    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"$prettyName expects array<float> or array<double> children, got $other")
    }
    private lazy val lFloat = isFloat(left)
    private lazy val rFloat = isFloat(right)

    override def dataType: DataType = DoubleType
    // The kernel returns null for length mismatch / null elements even when
    // both inputs are non-null.
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("foldRes")
        s"""
           |java.lang.Double $boxed = $kernel($a, $b, $lFloat, $rFloat);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.doubleValue(); }
         """.stripMargin
      })
  }

  /** dot_f(array<float|double>, array<float|double>) -> double. */
  case class DotProduct(left: Expression, right: Expression)
      extends ArrayPairFold {
    override def prettyName: String = "dot_f"
    override protected def kernel: String =
      "graft.functions.VectorExpressions.dotJava"
    override protected def fold(a: ArrayData, b: ArrayData,
                                aF: Boolean, bF: Boolean): java.lang.Double =
      dotJava(a, b, aF, bF)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotProduct = copy(l, r)
  }

  /** l2sq_f(array<float|double>, array<float|double>) -> double. */
  case class L2Squared(left: Expression, right: Expression)
      extends ArrayPairFold {
    override def prettyName: String = "l2sq_f"
    override protected def kernel: String =
      "graft.functions.VectorExpressions.l2sqJava"
    override protected def fold(a: ArrayData, b: ArrayData,
                                aF: Boolean, bF: Boolean): java.lang.Double =
      l2sqJava(a, b, aF, bF)
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): L2Squared = copy(l, r)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq_f", exprs => L2Squared(exprs(0), exprs(1)), "scala_udf")
  }

  def dotF(a: Column, b: Column): Column = call_function("dot_f", a, b)

  def l2sqF(a: Column, b: Column): Column = call_function("l2sq_f", a, b)
}
