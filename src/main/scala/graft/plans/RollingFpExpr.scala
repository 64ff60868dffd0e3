package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expression: the polynomial rolling-hash fingerprint of a
  * token array in one compiled loop — `fold(acc·B + (hash60(tok) mod
  * M) mod M)` with `hash60 = conv(substring(md5(tok),1,15),16,10)`,
  * bit-identical to the HOF spelling in `Text.rollingFingerprint`
  * (which remains as the reference implementation its parity spec
  * compares against).
  *
  * Why native: the HOF evaluates an interpreted Md5 → Substring →
  * Conv → Pmod expression chain PER TOKEN per document — the hottest
  * per-element work in the text family. Here the whole fold is one
  * JVM loop: the md5 runs on a thread-cached MessageDigest and the
  * 60-bit value is assembled directly from the digest bytes (the
  * first 15 hex chars are bytes 0..6 plus the high nibble of byte
  * 7), skipping hex-string round-trips entirely.
  *
  * NULL contract matches the HOF: empty array → NULL (seedless fold
  * has no value), any NULL element → NULL (the HOF's `acc + NULL`
  * poisons the fold).
  */
case class RollingFpExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = RollingFpExpr.compute(input.asInstanceOf[ArrayData])
    if (r < 0L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rfp")
      s"""
         |long $r = graft.plans.RollingFpExpr.compute($c);
         |if ($r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_fp"
}

object RollingFpExpr {
  /** Shared with `Text.rollB`/`rollM` — asserted equal in TextSpec so
    * the constants cannot drift apart.
    */
  val B: Long = 1000003L
  val M: Long = 2147483647L

  private val mdCache =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** -1 encodes NULL (the genuine fold value is always in [0, M)). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return -1L
    val md = mdCache.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return -1L
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex chars = bytes 0..6 + the high nibble of byte 7
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
      h = (h << 4) | ((d(7) & 0xFFL) >>> 4)
      // h ∈ [0, 2^60) and acc·B + h < 2^31·2^20 + 2^31 — no overflow
      acc = (acc * B + (h % M)) % M
      i += 1
    }
    acc
  }

  def rolling_fp(toks: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(RollingFpExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(toks)))

  /** SQL registration (GraftExtensions). */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_fp"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[RollingFpExpr].getName, "rolling_fp"),
    (children: Seq[Expression]) => children match {
      case Seq(toks) => RollingFpExpr(toks)
      case _ =>
        throw new IllegalArgumentException("usage: rolling_fp(tokens)")
    })
}
