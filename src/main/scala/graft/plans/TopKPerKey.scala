package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan => LP}

/** Whole-operator custom plan: per-key top-k with bounded heaps.
  *
  * Spark has a physical `TakeOrderedAndProject` for GLOBAL top-k, but
  * per-key top-k (`row_number().over(partitionBy(key).orderBy(ord))
  * <= k`) plans as a full `WindowExec`: exchange + complete SORT of
  * every partition, O(n log n) and memory-heavy, to then throw away
  * all but k rows per key. This operator keeps a size-k heap per key
  * instead — O(n log k) with memory O(keys·k) — the right shape when
  * k ≪ rows-per-key, which is exactly the similarity-search re-rank
  * and "top orders per customer" pattern.
  *
  * Stack: logical node → planner `Strategy` → `UnaryExecNode`
  * (requiredChildDistribution = ClusteredDistribution(keys), so
  * Catalyst inserts the single hash exchange) → per-partition heaps.
  * Output = child columns + `rank` (1-based within key, following the
  * given ordering with whatever tie-break columns it includes).
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
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ascending in this ordering = better rank
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap: head is the WORST of the current top-k → O(log k) evict
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val sorted = heap.dequeueAll.reverse // ascending = rank order
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          resultProj(joined(row, InternalRow(i + 1)))
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
