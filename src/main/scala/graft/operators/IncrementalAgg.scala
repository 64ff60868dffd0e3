package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive grouped aggregates —
  * keep `base.groupBy(keys).agg(count(*), sum(col)…)` current under a
  * [[ParquetUpsertSink.changeFeed]] without rescanning the table.
  *
  * At 100 TB the point is the asymptotics: a nightly batch that
  * touches 0.1% of rows costs a full-table aggregate to refresh any
  * downstream rollup by recompute; applying the change feed costs
  * O(delta) plus one keyed join against the (already aggregated,
  * orders-of-magnitude smaller) view.
  *
  * The algorithm is the classic counting form of IVM, expressed as
  * one Spark aggregation: every feed row gets weight
  *
  *  - `insert`, `update_postimage` → +1 (add the new contribution)
  *  - `delete`, `update_preimage`  → −1 (retract the old one)
  *
  * so the weighted per-key aggregate of the feed IS the delta, and the
  * new view = old view ⟗ delta with per-column addition, dropping keys
  * whose maintained row count reaches zero (the group no longer
  * exists). Updates therefore REQUIRE a feed with pre-images
  * (`changeFeed(…, withPreimages = true)`): without the old image, an
  * update is indistinguishable from an insert to a sum.
  *
  * Covers the distributive aggregates (COUNT, SUM — and AVG as
  * SUM/COUNT at read time). Non-distributive aggregates (MIN/MAX,
  * COUNT DISTINCT) are NOT maintainable from deltas alone — a deleted
  * minimum needs the base table to find the runner-up — and belong to
  * recompute, which is why this API takes explicit sum columns rather
  * than pretending generality.
  */
object IncrementalAgg {

  val countCol = "_ia_count"

  /** The maintained view of `base.groupBy(keys).agg(count, sums)`:
    * per key, `_ia_count` = row count and `sum_<c>` per sum column.
    * Build once from the initial snapshot, then advance with
    * [[advance]]. Sums are DOUBLE by contract on both the build and
    * advance paths (delta arithmetic is double; integer-valued inputs
    * stay exact within 2^53) — a native long sum here would diverge
    * in type from the advanced view.
    */
  def view(base: DataFrame, keys: Seq[String],
           sumCols: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c).cast("double")).as(s"sum_$c")): _*)

  /** `prev` advanced by `feed` (a change feed WITH pre-images over the
    * same key set). Equals `view(newSnapshot, keys, sumCols)` exactly
    * for any feed produced between the snapshots the view has seen.
    */
  def advance(prev: DataFrame, feed: DataFrame, keys: Seq[String],
              sumCols: Seq[String]): DataFrame = {
    require(feed.columns.contains("_change_type"),
      "feed must be a changeFeed output (missing _change_type)")
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    val delta = feed
      .withColumn("_w", w)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_w")).as(s"d_$countCol"),
        sumCols.map(c =>
          sum(col(c) * col("_w").cast("double")).as(s"d_sum_$c")): _*)
    // full outer: keys new to the view (pure inserts) and keys leaving
    // it (all rows deleted) both flow through one join of two
    // aggregate-sized relations
    val joined = prev.join(delta, keys, "full_outer")
    val newCount =
      (coalesce(col(countCol), lit(0L)) +
        coalesce(col(s"d_$countCol"), lit(0L))).as(countCol)
    val newSums = sumCols.map { c =>
      // a sum over zero remaining rows is NULL, matching what a
      // recompute would produce for a key that no longer exists —
      // but such keys are dropped by the count filter below anyway;
      // for surviving keys both sides null-coalesce (a key absent
      // from the delta keeps its old sum, a new key starts from 0)
      (coalesce(col(s"sum_$c"), lit(0.0)) +
        coalesce(col(s"d_sum_$c"), lit(0.0))).as(s"sum_$c")
    }
    joined
      .select((keys.map(col) :+ newCount) ++ newSums: _*)
      .filter(col(countCol) > 0)
  }
}
