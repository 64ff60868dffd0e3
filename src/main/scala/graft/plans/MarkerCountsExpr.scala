package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: ALL marker-stopword counts of a token array in
  * one compiled pass — `struct<en, fr, es, all>` where each field is
  * the number of tokens in the corresponding closed marker class
  * (`graft.functions.Text.{en,fr,es}Markers`; `all` = the distinct
  * union, the stopword-ratio numerator).
  *
  * Replaces up to four interpreted `size(filter(toks, isInCollection))`
  * HOF passes (three in langId, one in stopwordRatio — the scan gates
  * of every curation/quality query) with one loop over thread-shared
  * hash sets. Counts are bit-identical to the HOF spelling; the
  * whole-stage codegen CSEs the shared child, and even uneliminated
  * repeats are compiled loops.
  */
case class MarkerCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MarkerCountsExpr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_counts expects array<string>, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MarkerCountsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" graft.plans.MarkerCountsExpr.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "marker_counts"
}

object MarkerCountsExpr {

  val schema: StructType = StructType(Seq(
    StructField("en", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("all", IntegerType, nullable = false)))

  // built from Text's public marker seqs so the sets cannot drift
  // from the HOF spelling (TextSpec pins count parity as well)
  private def toSet(xs: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    xs.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }
  private lazy val enSet = toSet(graft.functions.Text.enMarkers)
  private lazy val frSet = toSet(graft.functions.Text.frMarkers)
  private lazy val esSet = toSet(graft.functions.Text.esMarkers)
  private lazy val allSet = toSet((graft.functions.Text.enMarkers ++
    graft.functions.Text.frMarkers ++ graft.functions.Text.esMarkers).distinct)

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var en = 0; var fr = 0; var es = 0; var all = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (enSet.contains(t)) en += 1
        if (frSet.contains(t)) fr += 1
        if (esSet.contains(t)) es += 1
        if (allSet.contains(t)) all += 1
      }
      i += 1
    }
    InternalRow(en, fr, es, all)
  }

  def marker_counts(toks: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(MarkerCountsExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(toks)))

  /** SQL registration (GraftExtensions). */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("marker_counts"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MarkerCountsExpr].getName, "marker_counts"),
    (children: Seq[Expression]) => children match {
      case Seq(toks) => MarkerCountsExpr(toks)
      case _ =>
        throw new IllegalArgumentException("usage: marker_counts(tokens)")
    })
}
