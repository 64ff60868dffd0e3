package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); libraries that
  * ship native Catalyst expressions use a shim in the
  * `org.apache.spark.sql` namespace to reach it — the same pattern
  * Spark's own connectors use. This is the only place the engine
  * touches a non-public Spark API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — the
    * `Dataset.ofRows` entry point, `private[sql]` in Spark 4.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Memory-manager page size for sizing external-sorter spill pages
    * (`SparkEnv.memoryManager` is `private[spark]`; this shim package
    * sits under `org.apache.spark` so it can read it, the same way
    * `SortExec` does).
    */
  def pageSizeBytes: Long =
    org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
}
