package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRUE subword tokenization (planted-vocab greedy longest-match, the
  * WordPiece family) as a codegen'd Catalyst expression — replacing the
  * regex proxy ([[TextFunctions.bpeTokenCount]], "BPE-ish") wherever a
  * budget must match what a trainer's tokenizer actually sees.
  *
  * The vocabulary is PLANTED and tiny by design — the operator under test
  * is the greedy merge-table encode loop, not a production vocab:
  *  - 3-char pieces ids 50..55: the ing and ion ent her
  *  - 2-char pieces ids 40..49: th he in er an re on at en nd
  *  - single chars: a..z -> 1..26, 0..9 -> 27..36
  *  - UNK = 0 for any other character (consumed one CODEPOINT at a time,
  *    matching SQL `substr` semantics so the DuckDB oracle counts the
  *    same pieces for non-BMP input)
  *  - ' ' is the word separator and emits nothing; pieces contain no
  *    space, so matching within the full string equals matching per word.
  *
  * Matching is greedy longest-first (3, then 2, then 1) at each position —
  * the standard WordPiece scan, SQL-recomputable with a recursive CTE
  * (p78's oracle walks each word with the same 3/2/1 CASE ladder).
  * Callers pass pre-normalized text ([[TextFunctions.normText]]).
  *
  * Per-row, deterministic, allocation-light; `doGenCode` is a static
  * forwarder so the encode stays inside whole-stage codegen with the scan
  * around it (the [[HashExpressions.SimHash64]] pattern) — at 100 TB the
  * tokenize pass is a dominant narrow stage, like minhash signatures.
  */
object Bpe {

  private[functions] val Pieces3 = Array("the", "ing", "and", "ion", "ent", "her")
  private[functions] val Pieces2 =
    Array("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd")

  /** Runtime kernel (public: generated Java calls the static forwarder). */
  def bpeEncodeJava(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[Integer](math.max(8, n / 2))
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == ' ') i += 1
      else {
        var matched = -1
        var step = 0
        if (i + 3 <= n) {
          var k = 0
          while (matched < 0 && k < Pieces3.length) {
            if (str.regionMatches(i, Pieces3(k), 0, 3)) { matched = 50 + k; step = 3 }
            k += 1
          }
        }
        if (matched < 0 && i + 2 <= n) {
          var k = 0
          while (matched < 0 && k < Pieces2.length) {
            if (str.regionMatches(i, Pieces2(k), 0, 2)) { matched = 40 + k; step = 2 }
            k += 1
          }
        }
        if (matched < 0) {
          if (c >= 'a' && c <= 'z') { matched = 1 + (c - 'a'); step = 1 }
          else if (c >= '0' && c <= '9') { matched = 27 + (c - '0'); step = 1 }
          else {
            // UNK consumes one CODEPOINT (surrogate pairs advance 2 chars)
            // so piece counts agree with codepoint-based SQL substr walks.
            matched = 0
            step = Character.charCount(str.codePointAt(i))
          }
        }
        out.add(matched)
        i += step
      }
    }
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** string -> array<int> of planted-vocab subword token ids. */
  case class BpeEncode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    override def nullSafeEval(input: Any): Any =
      bpeEncodeJava(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.bpeEncodeJava($c)")

    override protected def withNewChildInternal(c: Expression): BpeEncode = copy(c)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode", exprs => BpeEncode(exprs.head), "scala_udf")

  /** Encode pre-normalized text (pass [[TextFunctions.normText]] output). */
  def bpeEncode(text: Column): Column = {
    register(SparkSession.active)
    call_function("bpe_encode", text)
  }

  /** True subword token count — the budget a trainer-faithful packer uses
    * (vs the regex proxy [[TextFunctions.bpeTokenCount]]).
    */
  def bpeCount(text: Column): Column =
    org.apache.spark.sql.functions.size(bpeEncode(text))
}
