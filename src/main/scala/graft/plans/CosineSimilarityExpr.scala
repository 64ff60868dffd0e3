package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two float/double
  * array columns, with whole-stage codegen.
  *
  * Why not the built-in higher-order functions? `aggregate(zip_with(
  * a, b, *), 0d, +)` is semantically identical but HOFs evaluate
  * interpreted (CodegenFallback) — per-element lambda dispatch and
  * boxed accumulators, and three passes (dot, ‖a‖, ‖b‖) for a full
  * cosine. This expression emits one fused primitive loop inside
  * whole-stage codegen: a single pass accumulating dot/‖a‖²/‖b‖² in
  * registers. Accumulation order is left-to-right, matching both the
  * HOF formulation and a sequential SQL engine — results are
  * bit-identical to `Similarity.cosineHof`, edge cases included:
  * a null element or mismatched array lengths yield NULL (in the HOF
  * form, `zip_with` pads the shorter array with nulls and a null
  * product nulls the whole `aggregate`), as does a zero-norm input
  * (`try_divide`). Nulls — not 0-contribution fallbacks — surface
  * upstream data bugs instead of silently scoring corrupt vectors.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // zero-norm (or empty) input ⇒ NULL, matching Spark's Divide
  // null-on-zero-divisor semantics and the HOF formulation — NaN
  // would sort ABOVE every real score in a desc ranking.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val la = elemIsFloat(left); val rb = elemIsFloat(right)
    val n = a.numElements()
    var bad = n != b.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n && !bad) {
      if (a.isNullAt(i) || b.isNullAt(i)) bad = true
      else {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    if (bad || na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; } else {
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |if ($bad || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarityExpr {
  /** Column-API entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(CosineSimilarityExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => CosineSimilarityExpr(a, b)
      case _ => throw SparkException.internalError(
        "cosine_sim requires exactly 2 arguments")
    })
}

/** Session extensions: registers the engine's native functions for
  * SQL use (`SELECT cosine_sim(a.embedding, b.embedding) ...`).
  * Install with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarityExpr.functionDescriptor)
    ext.injectFunction(DotProductExpr.functionDescriptor)
    ext.injectFunction(SrpBucketsExpr.functionDescriptor)
    ext.injectFunction(RollingFpExpr.functionDescriptor)
    ext.injectFunction(ShingleHashesExpr.functionDescriptor)
    ext.injectFunction(MarkerCountsExpr.functionDescriptor)
    ext.injectFunction(TokensExpr.functionDescriptor)
    ext.injectFunction(SimhashAgg.functionDescriptor)
    ext.injectFunction(MinhashAgg.functionDescriptor)
    ext.injectFunction(MisraGriesAgg.functionDescriptor)
    ext.injectFunction(VectorAvgAgg.functionDescriptor)
    ext.injectOptimizerRule(_ => RewriteRankFilterToTopK)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
