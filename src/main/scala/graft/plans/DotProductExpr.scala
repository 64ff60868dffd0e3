package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float/double array
  * columns, one fused primitive loop inside whole-stage codegen.
  *
  * The HOF spelling `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * semantically identical but evaluates interpreted (CodegenFallback,
  * boxed accumulator, per-element lambda dispatch) — the sign-random-
  * projection bucketing pays that tax tables×planes times per vector.
  * Accumulation is left-to-right from an additive identity, so results
  * are bit-identical to the HOF fold; edge semantics match too: a null
  * element or mismatched lengths yield NULL (zip_with pads with nulls
  * and a null product nulls the aggregate).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val la = elemIsFloat(left); val rb = elemIsFloat(right)
    val n = a.numElements()
    var bad = n != b.numElements()
    // fold starts at the additive identity, matching aggregate(…, 0d, +)
    var acc = 0.0; var i = 0
    while (i < n && !bad) {
      if (a.isNullAt(i) || b.isNullAt(i)) bad = true
      else {
        val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    if (bad) null else acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; } else {
         |    $acc += $getA * $getB;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProductExpr {
  /** Column-API entry point. */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(DotProductExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProductExpr].getName, "dot_product"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => DotProductExpr(a, b)
      case _ => throw org.apache.spark.SparkException.internalError(
        "dot_product requires exactly 2 arguments")
    })
}
