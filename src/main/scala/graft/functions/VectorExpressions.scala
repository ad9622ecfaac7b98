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

    // Element kind per side: Some(true)=float, Some(false)=double, None =
    // not directly foldable. Int/long/NULL arguments are handled at the
    // REGISTRATION sites by wrapping in Cast(_, array<double>) — same
    // pattern as InterleaveBits, since declaring ExpectsInputTypes is not
    // possible on this Spark build (AbstractDataType is private[sql]).
    private def kind(e: Expression): Option[Boolean] = e.dataType match {
      case ArrayType(FloatType, _) => Some(true)
      case ArrayType(DoubleType, _) => Some(false)
      case _ => None
    }
    private lazy val lFloat = kind(left).getOrElse(fail(left))
    private lazy val rFloat = kind(right).getOrElse(fail(right))
    private def fail(e: Expression): Nothing =
      throw new IllegalArgumentException(
        s"$prettyName expects array<float> or array<double> children, got " +
          s"${e.dataType.simpleString}; cast the argument (SQL registration " +
          "sites do this automatically)")

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

  /** Registration-site coercion: float/double arrays pass through; every
    * other argument (array<int>, array<long>, NULL literals, …) is cast to
    * array<double>, preserving the HOF form's semantics — int arrays fold
    * numerically, NULL stays NULL. Unresolved arguments (SQL analysis in
    * progress) defer to a cast too, which is a no-op once resolved to a
    * float/double array... so only apply it when the type is KNOWN to need
    * it; unresolved stays bare and resolves via the expression's own
    * lazy check.
    */
  private def coerce(e: Expression): Expression = {
    val needsCast =
      try e.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
        case _ => true
      } catch { case _: Exception => false } // unresolved: leave bare
    if (needsCast)
      org.apache.spark.sql.catalyst.expressions.Cast(
        e, ArrayType(DoubleType, containsNull = true))
    else e
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

  /** Coerced constructors — the single builder both registration paths
    * (session extension injection and temp-function registration) share.
    */
  def dotExpr(a: Expression, b: Expression): Expression =
    DotProduct(coerce(a), coerce(b))
  def l2sqExpr(a: Expression, b: Expression): Expression =
    L2Squared(coerce(a), coerce(b))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", exprs => dotExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq_f", exprs => l2sqExpr(exprs(0), exprs(1)), "scala_udf")
  }

  // The Column API resolves through the function registry (public-API-only
  // expression construction — same rationale as HashExpressions.register).
  // Sessions built via GraftSession get the functions injected; for any
  // OTHER session, registering idempotently on the active one keeps
  // VectorFunctions.dot/cosine and every Similarity operator self-contained
  // — before round 6 these were registry-free HOF expressions, and that
  // zero-setup contract must survive the codegen swap.
  private def ensureRegistered(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(register)

  def dotF(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("dot_f", a, b)
  }

  def l2sqF(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("l2sq_f", a, b)
  }
}
