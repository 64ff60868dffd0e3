package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the standard per-key top-k idiom
  *
  *   Filter(rank <= k, Window(row_number() over (partition by p order by o)))
  *
  * into [[TopKPerKeyPlan]] — users keep writing the window-function
  * formulation and get the bounded-heap physical operator (no
  * per-partition sort) automatically. Fires only on the exact shape
  * where the rewrite is semantics-preserving:
  *  - the window computes a single row_number() with a non-empty
  *    partition spec (global top-k is TakeOrderedAndProject's job);
  *  - the filter is `rank <= k` / `rank < k` / `rank = 1` on the
  *    row_number output.
  * Everything else keeps Spark's WindowExec.
  *
  * Install per session via [[TopKRewrite.install]]
  * (`experimental.extraOptimizations`) or globally through
  * `GraftExtensions` (`spark.sql.extensions`).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def limitFor(cond: Expression, rank: ExprId): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rank && v > 0 => Some(v)
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rank && v > 1 => Some(v - 1)
      case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rank && v == 1 => Some(1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rank && v > 0 => Some(v)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(al @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(parts, order, _)),
          _)), _, _, child, _))
        if parts.nonEmpty && order.nonEmpty =>
      limitFor(cond, al.exprId) match {
        case Some(k) =>
          val rankAttr = al.toAttribute.asInstanceOf[AttributeReference]
          TopKPerKeyPlan(parts, order, k, child, rankAttr)
        case None => f
      }
  }
}

object TopKRewrite {
  /** Install the rewrite rule + planner strategy on a session. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilterToTopK
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}
