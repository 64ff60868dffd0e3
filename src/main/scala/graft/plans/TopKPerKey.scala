package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan => LP}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Whole-operator custom plan: per-key top-k with bounded heaps.
  *
  * Spark has a physical `TakeOrderedAndProject` for GLOBAL top-k, but
  * per-key top-k (`row_number().over(partitionBy(key).orderBy(ord))
  * <= k`) plans as a full `WindowExec`: exchange + complete SORT of
  * every partition, O(n log n) and memory-heavy, to then throw away
  * all but k rows per key. This operator keeps a size-k heap per key
  * instead — O(n log k) with memory O(keys·k) — the right shape when
  * k ≪ rows-per-key, which is exactly the similarity-search re-rank
  * and "top orders per customer" pattern. When key cardinality makes
  * O(keys·k) unsafe (> `spark.graft.topk.spillThresholdRows` buffered
  * rows in one partition), the partition degrades to a spillable
  * external sort + streaming rank pass, so the operator never OOMs
  * where WindowExec would have survived.
  *
  * Stack: logical node → planner `Strategy` → TWO `UnaryExecNode`
  * phases, like partial aggregation: a map-side partial pass reduces
  * each input partition to ≤ k rows per key, THEN the final exec's
  * requiredChildDistribution = ClusteredDistribution(keys) makes
  * Catalyst insert the hash exchange — which therefore carries at
  * most k·partitions rows per key, not every input row — and the
  * final per-key heaps rank the merged survivors. Output = child
  * columns + `rank` (1-based within key, following the given
  * ordering with whatever tie-break columns it includes).
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference =
      AttributeReference("rank", IntegerType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LP): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, rankAttr) =>
      // Two-phase, like partial aggregation: a map-side pass reduces
      // each input partition to ≤ k rows per key BEFORE the hash
      // exchange (the global top-k per key is a subset of the union
      // of per-partition top-ks), so the shuffle carries at most
      // k·partitions rows per key instead of every scored row — at
      // scale the exchange, not the heap work, is the bill.
      val partial = TopKPerKeyExec(keys, order, k, rankAttr,
        planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {

  // The partial (map-side) phase emits plain child rows — ranks are
  // only meaningful after the final phase has seen every candidate.
  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial || keys.isEmpty) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val outAttrs = output
    val isPartial = partial
    // Heap mode buffers O(keys·k) rows; at high key cardinality that is
    // an executor OOM, so once a partition holds more than this many
    // buffered rows we abandon heaps and fall back to a SPILLABLE
    // external sort by (keys ++ order) with a streaming rank pass —
    // same memory profile as Spark's WindowExec, minus the per-window
    // row buffering.
    val spillThresholdRows =
      conf.getConfString("spark.graft.topk.spillThresholdRows",
        (4 * 1024 * 1024).toString).toLong
    // A sort-based fallback needs orderable key types (grouping allows
    // e.g. maps which cannot sort); non-orderable keys keep heap mode.
    val canSpill = keyExprs.forall(e => RowOrdering.isOrderable(e.dataType))
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ascending in this ordering = better rank
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap: head is the WORST of the current top-k → O(log k) evict
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      var buffered = 0L
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.enqueue(row.copy()); buffered += 1
          overflowed = canSpill && buffered > spillThresholdRows && iter.hasNext
        } else if (ord.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // Partial phase: emit the surviving rows as-is (no rank — the
      // final phase re-ranks after the exchange merges partitions).
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      if (!overflowed) {
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          val sorted = heap.dequeueAll.reverse // ascending = rank order
          if (isPartial) sorted.iterator.map(resultProj)
          else sorted.iterator.zipWithIndex.map { case (row, i) =>
            resultProj(joined(row, InternalRow(i + 1)))
          }
        }
      } else {
        // Spill path: feed already-buffered heap rows plus the rest of
        // the input into an UnsafeExternalRowSorter (acquires from the
        // task memory manager, spills to disk under pressure, cleans up
        // on task completion), sorted by keys then rank order; then a
        // single streaming pass emits rank 1..k per key group.
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val fullOrder =
          keyExprs.map(SortOrder(_, Ascending)) ++ sortOrder
        val sortOrd: Ordering[InternalRow] =
          GenerateOrdering.generate(fullOrder, childOutput)
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(r: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, sortOrd, PrefixComparators.LONG, prefixComputer,
          ColumnBridge.pageSizeBytes, false)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        def insert(r: InternalRow): Unit = r match {
          // insertRow copies bytes into sorter pages immediately, so
          // passing the projection's reused buffer is safe.
          case u: UnsafeRow => sorter.insertRow(u)
          case other        => sorter.insertRow(toUnsafe(other))
        }
        heaps.values().forEach(h => h.foreach(insert))
        heaps.clear()
        while (iter.hasNext) insert(iter.next())
        val sorted = sorter.sort()
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var rank = 0
          private var ready: InternalRow = null
          private def advance(): Unit = {
            while (ready == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyProj(row)
              if (curKey == null || key != curKey) {
                curKey = key.copy(); rank = 1
              } else rank += 1
              if (rank <= limit)
                ready = if (isPartial) resultProj(row)
                        else resultProj(joined(row, InternalRow(rank)))
            }
          }
          override def hasNext: Boolean = { advance(); ready != null }
          override def next(): InternalRow = {
            advance()
            val r = ready; ready = null; r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {
  /** Sort spec: column name + direction. */
  final case class Ord(name: String, desc: Boolean = false)
  def asc(name: String): Ord = Ord(name)
  def desc(name: String): Ord = Ord(name, desc = true)

  /** Per-key top-k as a DataFrame op: `order` must define a total
    * order (include a tie-break column) for deterministic output.
    * Attributes are resolved by name against the analyzed input (the
    * Column→Expression bridge yields lazy wrappers the analyzer does
    * not descend into for custom nodes). Installs the planner
    * strategy on the session if absent.
    */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[Ord],
            k: Int): DataFrame = {
    require(keys.nonEmpty,
      "TopKPerKey needs grouping keys — use orderBy(...).limit(k) " +
        "(TakeOrderedAndProject) for global top-k")
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = ColumnBridge.logicalPlan(df)
    def attr(n: String): Attribute = child.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(",")}"))
    val sortOrders = order.map { o =>
      SortOrder(attr(o.name),
        if (o.desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keys.map(attr), sortOrders, k, child))
  }
}
