package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") sketch as a custom
  * Catalyst AGGREGATE — the third classic sketch family next to the
  * engine's approx-distinct (HLL) and approx-percentile (KLL-class)
  * rows. Reference analog: the rides pipeline's exact grouped counts
  * (`02_silver_realtime_rides.py` aggregations); this is the bounded-
  * state spelling a 100 TB token stream needs when the exact
  * `groupBy(token)` shuffle is the thing being avoided.
  *
  * State is AT MOST k (token, counter) pairs plus the processed-row
  * count n — O(k) per partition regardless of input size, merged
  * map-side like any TypedImperativeAggregate (ObjectHashAggregate
  * partials), so the full aggregation moves k·partitions tiny pairs
  * instead of shuffling the token universe.
  *
  * Contract (the certification row pins both halves):
  *   - `est(t) <= true(t)` — counters only advance on real
  *     occurrences; decrements/merge-subtractions only lower them.
  *   - `true(t) - est(t) <= n / (k+1)` — an `update` decrement round
  *     cancels k+1 occurrences' mass (k live counters + the arriving
  *     token it declines to seat), so at most n/(k+1) rounds happen;
  *     `merge` subtracts the (k+1)-th largest combined counter, which
  *     Agarwal et al. (Mergeable Summaries, PODS'12) show preserves
  *     the same bound for ANY merge tree — the guarantee is
  *     partition-layout independent, which is what makes the oracle
  *     row deterministic even though individual estimates are not.
  *   - every token with `true(t) > n/(k+1)` is present in the sketch
  *     (its counter cannot have been driven to zero).
  *
  * NULL tokens are ignored (not counted in n), matching `count(col)`.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.State] {

  require(k > 0, s"misra_gries k must be positive, got $k")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a string token column, got ${other.catalogString}")
  }

  private val itemType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGriesAgg.State =
    new MisraGriesAgg.State(0L, mutable.HashMap.empty[String, Long])

  override def update(
      buffer: MisraGriesAgg.State, input: InternalRow): MisraGriesAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      buffer.n += 1L
      // materialize to String: the UTF8String may alias a buffer the
      // scan reuses for the next row, and map keys must be stable
      val token = v.asInstanceOf[UTF8String].toString
      val cur = buffer.counts.getOrElse(token, 0L)
      if (cur > 0L) {
        buffer.counts.update(token, cur + 1L)
      } else if (buffer.counts.size < k) {
        buffer.counts.update(token, 1L)
      } else {
        // classic MG collision: decrement every live counter by one and
        // decline to seat the arrival — k+1 occurrences' mass cancels
        val dead = mutable.ArrayBuffer.empty[String]
        buffer.counts.mapValuesInPlace { (t, c) =>
          if (c == 1L) dead += t
          c - 1L
        }
        dead.foreach(buffer.counts.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: MisraGriesAgg.State,
      other: MisraGriesAgg.State): MisraGriesAgg.State = {
    buffer.n += other.n
    other.counts.foreach { case (t, c) =>
      buffer.counts.update(t, buffer.counts.getOrElse(t, 0L) + c)
    }
    if (buffer.counts.size > k) {
      // subtract the (k+1)-th largest combined counter from all —
      // the mergeable-summaries reduction back to <= k entries
      val sorted = buffer.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val threshold = sorted(sorted.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.counts.mapValuesInPlace { (t, c) =>
        if (c <= threshold) dead += t
        c - threshold
      }
      dead.foreach(buffer.counts.remove)
    }
    buffer
  }

  override def eval(buffer: MisraGriesAgg.State): Any = {
    // deterministic presentation order: estimate desc, token asc
    val items = buffer.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericInternalRow(Array[Any](
      buffer.n,
      new GenericArrayData(items.map { case (t, c) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(t), c)): Any
      })))
  }

  override def serialize(buffer: MisraGriesAgg.State): Array[Byte] = {
    val entries = buffer.counts.toArray
    val tokenBytes = entries.map { case (t, _) =>
      t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    val size = 8 + 4 + tokenBytes.map(_.length + 4 + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putLong(buffer.n)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(tokenBytes(i).length)
      bb.put(tokenBytes(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val count = bb.getInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < count) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val c = bb.getLong()
      m.update(new String(arr, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    new MisraGriesAgg.State(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {

  /** Mutable sketch state: processed-row count + at most k counters. */
  final class State(var n: Long, val counts: mutable.HashMap[String, Long])

  /** Column-API entry point: aggregate a string token column into a
    * `{total, items: [{token, est}]}` frequent-items summary holding
    * at most k counters.
    */
  def misra_gries(token: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MisraGriesAgg(org.apache.spark.sql.graft.ColumnBridge
        .expression(token), k).toAggregateExpression())

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MisraGriesAgg].getName, "misra_gries"),
    (children: Seq[Expression]) => children match {
      case Seq(t, org.apache.spark.sql.catalyst.expressions
          .Literal(k: Int, IntegerType)) if k > 0 => MisraGriesAgg(t, k)
      case _ => throw new IllegalArgumentException(
        "misra_gries requires (token_column, positive literal int k), " +
          "e.g. misra_gries(token, 64)")
    })
}
