package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: whitespace tokenization with empty tokens
  * dropped — the fused form of `filter(split(text, "\\s+"), _ =!= "")`
  * ([[graft.functions.Text.tokens]]'s reference spelling).
  *
  * `split` itself is codegen'd, but the `filter` higher-order function
  * is CodegenFallback: every tokenize call materialized the unfiltered
  * array, then left whole-stage codegen to run an interpreted
  * per-element lambda — on the scan path of every text-family query
  * (stats, word counts, TF-IDF, packing, curation gates). This
  * expression produces the filtered array in one compiled pass and
  * keeps the pipeline inside the codegen span.
  *
  * Honest measurement (sf0.1 A/B over the seven tokenize-heavy bench
  * queries): NEUTRAL — the regex split dominates tokenize cost, so
  * removing the filter boundary is hygiene (one interpreted node and
  * one intermediate array less, unbroken codegen spans), not a
  * measured speedup at this scale. Contrast ShingleHashesExpr, where
  * fusing tokenize→shingle→hash (much more work per row) measures
  * 1.4–4.3×: fusion wins in proportion to the work it absorbs.
  *
  * Bit-parity with the HOF spelling is guaranteed by splitting through
  * the SAME `UTF8String.split(pattern, -1)` entry point Spark's
  * `StringSplit` uses (identical regex semantics, identical
  * leading/trailing-empty behavior) before dropping empties; TextSpec
  * pins corpus-wide equality and EngineProperties covers random
  * whitespace shapes.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokens expects string, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TokensExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.TokensExpr.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "tokens"
}

object TokensExpr {

  private val sep = UTF8String.fromString("\\s+")

  def compute(s: UTF8String): GenericArrayData = {
    // the exact split StringSplit performs (limit -1), then one pass
    // dropping empties — no intermediate Catalyst array
    val parts = s.split(sep, -1)
    var kept = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) kept += 1
      i += 1
    }
    val out = new Array[Any](kept)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(j) = parts(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder. */
  def tokens(text: Column): Column =
    ColumnBridge.column(TokensExpr(ColumnBridge.expression(text)))

  /** SQL registration (GraftExtensions). */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("tokens"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TokensExpr].getName, "tokens"),
    (children: Seq[Expression]) => children match {
      case Seq(text) => TokensExpr(text)
      case _ => throw new IllegalArgumentException("usage: tokens(text)")
    })
}
