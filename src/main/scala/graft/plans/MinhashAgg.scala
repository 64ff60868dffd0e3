package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE: the k-permutation MinHash signature of a
  * group of shingle hashes in one array-buffered pass.
  *
  * Math is identical to [[graft.functions.Dedup.minhashSignatures]]'s
  * declarative spelling (k `min` aggregates over the universal-hash
  * family h_i(x) = (a_i·(x mod p) + b_i) mod p, p = 2³¹−1): `update`
  * computes `x mod p` ONCE per row then tightens all k minima in a
  * loop, where the declarative form evaluates k separate pmod
  * expression trees per row against a k-column-wide buffer. `merge`
  * takes elementwise minima, so map-side partial aggregation reduces
  * the exchange to one signature per (partition, doc) exactly like the
  * declarative plan. a_i·(x mod p) < 2⁶² — no overflow.
  * Output: array<long> of length k; bit-identical to the declarative
  * form (integer math; MinhashAggSpec).
  */
case class MinhashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import graft.functions.Dedup.{minhashA, minhashB, minhashP}

  require(k > 0, s"minhash_agg needs a positive signature length, got $k")

  // permutation constants materialized once per operator instance
  private lazy val as: Array[Long] = Array.tabulate(k)(minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(k)(minhashB)

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg expects a bigint shingle hash, got ${other.catalogString}")
  }

  // containsNull mirrors the declarative k-`min` spelling: a group
  // whose inputs are all NULL yields k NULL minima (an array of nulls,
  // not a NULL array) — see eval's empty-group branch.
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = java.lang.Math.floorMod(v.asInstanceOf[Long], minhashP)
      var i = 0
      while (i < k) {
        val h = (as(i) * base + bs(i)) % minhashP
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    // Every real hash is < p << Long.MaxValue, so a surviving sentinel
    // means NO non-null input reached this group: return the k NULL
    // minima the declarative k-`min` spelling produces (unreachable
    // from docShingleHashes, but direct SQL users of minhash_agg can
    // aggregate nullable columns).
    if (buffer(0) == Long.MaxValue) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_agg"
}

object MinhashAgg {
  /** Column-API entry point: aggregate a bigint shingle-hash column
    * into the group's k-length MinHash signature.
    */
  def minhash_agg(shingleHash: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinhashAgg(org.apache.spark.sql.graft.ColumnBridge
        .expression(shingleHash), k).toAggregateExpression())

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_agg"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MinhashAgg].getName, "minhash_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(h, org.apache.spark.sql.catalyst.expressions
          .Literal(k: Int, IntegerType)) if k > 0 => MinhashAgg(h, k)
      case _ => throw new IllegalArgumentException(
        "minhash_agg requires (hash_column, positive literal int k), " +
          "e.g. minhash_agg(sh, 64)")
    })
}
