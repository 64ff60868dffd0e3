package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE: elementwise average of a group of
  * double-array vectors — the centroid-recompute kernel of every
  * Lloyd-style iteration (k-means topics, the IVF coarse quantizer).
  *
  * The compositional formulation (`posexplode` the vector, average per
  * (group, dim), re-assemble with `array_sort(collect_list(...))`)
  * multiplies the aggregation's shuffled row count by the
  * dimensionality AND pays a second exchange for the re-assembly. This
  * is the same math in one buffered pass: per-dim (sum, count) arrays,
  * map-side partial merge, one narrow exchange of one buffer per
  * group (guide §2.3 — aggregate before you shuffle, don't explode
  * what you immediately re-assemble).
  *
  * Semantics match the exploded spelling exactly:
  *   - per-dim counts (a NULL element, or a row whose vector is
  *     shorter than the group's widest, contributes to neither sum
  *     nor count for that dim — like the exploded row being absent
  *     or avg ignoring its NULL);
  *   - a dim with zero contributions evaluates NULL (avg over empty);
  *   - a NULL vector contributes nothing (posexplode emits no rows);
  *   - per-partition addition order is the input row order, the same
  *     order the exploded partial aggregation added in. (Merge order
  *     across partitions is shuffle-arrival nondeterministic in BOTH
  *     spellings — callers round the carried centroid state to 6 dp
  *     for exactly that reason.)
  *
  * Returns array<double> of per-dim averages, length = the group's
  * widest input vector.
  */
case class VectorAvgAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgAgg.Buf] {

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg expects array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): VectorAvgAgg.Buf =
    new VectorAvgAgg.Buf(new Array[Double](0), new Array[Long](0))

  override def update(buf: VectorAvgAgg.Buf,
                      input: InternalRow): VectorAvgAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    buf.grow(n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        buf.sums(i) += arr.getDouble(i)
        buf.counts(i) += 1L
      }
      i += 1
    }
    buf
  }

  override def merge(buf: VectorAvgAgg.Buf,
                     other: VectorAvgAgg.Buf): VectorAvgAgg.Buf = {
    buf.grow(other.sums.length)
    var i = 0
    while (i < other.sums.length) {
      buf.sums(i) += other.sums(i)
      buf.counts(i) += other.counts(i)
      i += 1
    }
    buf
  }

  override def eval(buf: VectorAvgAgg.Buf): Any = {
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < buf.sums.length) {
      out(i) = if (buf.counts(i) == 0L) null else buf.sums(i) / buf.counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VectorAvgAgg.Buf): Array[Byte] = {
    val n = buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val sums = Array.fill(n)(bb.getDouble())
    val counts = Array.fill(n)(bb.getLong())
    new VectorAvgAgg.Buf(sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_avg"
}

object VectorAvgAgg {
  /** Growable per-dim (sum, count) accumulator. */
  final class Buf(var sums: Array[Double], var counts: Array[Long]) {
    def grow(n: Int): Unit = if (n > sums.length) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
  }

  /** Column-API entry point: aggregate an array<double> column into
    * the group's per-dim average vector.
    */
  def vector_avg(vec: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      VectorAvgAgg(org.apache.spark.sql.graft.ColumnBridge
        .expression(vec)).toAggregateExpression())

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("vector_avg"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[VectorAvgAgg].getName, "vector_avg"),
    (children: Seq[Expression]) => children match {
      case Seq(v) => VectorAvgAgg(v)
      case _ => throw new IllegalArgumentException(
        "vector_avg requires exactly 1 argument: vector_avg(vec)")
    })
}
