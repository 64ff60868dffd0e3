package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expression: all word-`n`-gram shingle HASHES of a token
  * array in one compiled pass — for each window of `n` tokens, the
  * 60-bit md5 value of the space-joined shingle string, emitted as
  * array<long>. Bit-identical to the HOF pipeline
  * `transform(sequence(...), i -> concat_ws(" ", toks[i..i+n-1]))`
  * followed by `Hashing.hash60` (TextSpec pins the parity), but:
  *
  *  - the HOF transform evaluates interpreted, per element;
  *  - the shingle STRING never materializes — window bytes stream
  *    straight into a thread-cached MessageDigest (concat_ws
  *    semantics preserved: null tokens are skipped, separators join
  *    only what remains);
  *  - downstream explodes 8-byte longs instead of 3-word strings.
  *
  * This feeds `Dedup.docShingleHashes` — the base relation of the
  * entire minhash/LSH/jaccard dedup family, evaluated once per
  * document per query. Fewer than `n` tokens → empty array (the HOF's
  * `when(size >= n) … otherwise(empty)` contract).
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shingle width must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" graft.plans.ShingleHashesExpr.compute($c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashesExpr {

  private val mdCache =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val space = Array[Byte](' ')

  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // pre-fetch token bytes once: each token participates in up to n
    // windows, and getUTF8String+getBytes per window would re-copy
    val toks = new Array[Array[Byte]](len)
    var t = 0
    while (t < len) {
      toks(t) = if (arr.isNullAt(t)) null else arr.getUTF8String(t).getBytes
      t += 1
    }
    val md = mdCache.get()
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      md.reset()
      // concat_ws semantics: nulls are skipped, separator joins only
      // the tokens actually present
      var first = true
      var j = 0
      while (j < n) {
        val tb = toks(i + j)
        if (tb != null) {
          if (!first) md.update(space)
          md.update(tb)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      h = (h << 4) | ((d(7) & 0xFFL) >>> 4)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingle_hashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(ShingleHashesExpr(
      org.apache.spark.sql.graft.ColumnBridge.expression(toks), n))

  /** SQL registration (GraftExtensions); width must be an integer
    * literal — it shapes the computation, not the data.
    */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[ShingleHashesExpr].getName, "shingle_hashes"),
    (children: Seq[Expression]) => children match {
      case Seq(toks,
          org.apache.spark.sql.catalyst.expressions.Literal(w: Int, IntegerType)) =>
        ShingleHashesExpr(toks, w)
      case _ => throw new IllegalArgumentException(
        "usage: shingle_hashes(tokens, width) with width an integer literal")
    })
}
