package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

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
  * SUM/COUNT at read time) in [[view]]/[[advance]]. MIN/MAX are not
  * maintainable from deltas alone — a deleted minimum needs the base
  * table to find the runner-up — so [[minMaxView]]/[[advanceMinMax]]
  * use base-assisted repair: retractions that touch a stored extremum
  * mark the key damaged, and ONLY damaged keys recompute from the
  * base (a semi-join), keeping refresh O(delta + affected keys).
  *
  * COUNT(DISTINCT col) is maintained EXACTLY through a
  * (key, value) → multiplicity SIDE TABLE ([[distinctState]] /
  * [[advanceDistinct]] / [[readDistinct]]) — the counting algorithm
  * generalized one level down: the state tracks how many live rows
  * witness each (key, value) pair, feed weights move multiplicities,
  * pairs at zero drop out, and the distinct count per key is the
  * state's row count. Refresh stays O(delta + state); the state is
  * bounded by the number of LIVE DISTINCT pairs, which is what any
  * exact distinct-count must pay.
  */
object IncrementalAgg {

  val countCol = "_ia_count"

  /** Maintained columns must be numeric and NON-decimal: all delta
    * arithmetic here is double-based (exact for integer-valued inputs
    * within 2^53 — the declared contract), so a decimal money column
    * would silently trade its exactness for double rounding. Fail
    * loudly; a caller that accepts the contract casts to double
    * explicitly at the call site.
    */
  private def requireMaintainable(df: DataFrame, cols: Seq[String],
                                  ctx: String): Unit =
    cols.foreach { c =>
      val f = df.schema.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"$ctx column $c is missing from " +
            df.schema.fieldNames.mkString("[", ",", "]")))
      f.dataType match {
        case _: DecimalType => throw new IllegalArgumentException(
          s"$ctx column $c is ${f.dataType}: maintained-view delta " +
            "arithmetic is double-based and would silently lose decimal " +
            "exactness — cast to double at the call site to accept that, " +
            "or keep exact decimals out of maintained views")
        case _: NumericType => ()
        case other => throw new IllegalArgumentException(
          s"$ctx column $c must be numeric (non-decimal), got $other")
      }
    }

  /** A trustworthy feed is one the `withPreimages = true` change-feed
    * path produced (its `_change_type` column carries the schema
    * marker). The bare "has a `_change_type` column" shape check is
    * NOT enough: the default two-arg [[ParquetUpsertSink.changeFeed]]
    * overload passes it, yet its update post-images would add +1/+sum
    * with no matching retraction — counts and sums silently inflate
    * with no error. The marker rides the column metadata through
    * projection, filtering, checkpointing, and parquet, so any
    * derivation of a marked feed stays accepted.
    */
  private def requirePreimageFeed(feed: DataFrame): Unit = {
    require(feed.columns.contains("_change_type"),
      "feed must be a changeFeed output (missing _change_type)")
    require(ParquetUpsertSink.hasPreimageMarker(feed),
      "feed lacks update pre-images: exact update retraction needs the " +
        "old row image, so build the feed with changeFeed(from, to, " +
        "withPreimages = true) — a post-image-only feed would silently " +
        "inflate the maintained aggregate")
  }

  /** Full-outer join of `prev` and `delta` on `joinCols` with
    * NULL-SAFE key equality, join columns coalesced into single output
    * columns — the shape `join(delta, joinCols, "full_outer")` would
    * give, except that a NULL key matches its counterpart instead of
    * producing two disjoint rows. SQL GROUP BY treats NULL keys as one
    * group, so every advance join here must too: with the null-unsafe
    * using-column join, a null-keyed group's prev-state and delta rows
    * never merge and the maintained aggregate silently double-counts
    * that group. `<=>` keys still extract as equi-join keys, so the
    * plan stays a hash join, not a cross product.
    */
  private def fullOuterNullSafe(prev: DataFrame, delta: DataFrame,
                                joinCols: Seq[String]): DataFrame = {
    val l = prev.alias("_ia_l")
    val r = delta.alias("_ia_r")
    // foldLeft, not reduce: keys = Nil is the GLOBAL rollup (a legal
    // groupBy() aggregate), whose advance joins the two 1-row frames
    // on the always-true condition — reduce would throw on empty
    val cond = joinCols.map(c => col(s"_ia_l.$c") <=> col(s"_ia_r.$c"))
      .foldLeft(lit(true))(_ && _)
    val outCols =
      joinCols.map(c => coalesce(col(s"_ia_l.$c"), col(s"_ia_r.$c")).as(c)) ++
        prev.columns.filterNot(joinCols.contains)
          .map(c => col(s"_ia_l.$c")) ++
        delta.columns.filterNot(joinCols.contains)
          .map(c => col(s"_ia_r.$c"))
    l.join(r, cond, "full_outer").select(outCols: _*)
  }

  /** The maintained view of `base.groupBy(keys).agg(count, sums)`:
    * per key, `_ia_count` = row count and `sum_<c>` per sum column.
    * Build once from the initial snapshot, then advance with
    * [[advance]]. Sums are DOUBLE by contract on both the build and
    * advance paths (delta arithmetic is double; integer-valued inputs
    * stay exact within 2^53) — a native long sum here would diverge
    * in type from the advanced view.
    */
  def view(base: DataFrame, keys: Seq[String],
           sumCols: Seq[String]): DataFrame = {
    requireMaintainable(base, sumCols, "sum")
    // `_nn_<c>` = non-null WITNESS count per sum column, the state
    // that lets advance reproduce SQL's NULL-sum semantics exactly: a
    // live key whose measure values are all NULL must read sum = NULL
    // (what a recompute yields), not 0.0 — indistinguishable from the
    // sum alone once deltas start coalescing. Appended AFTER the sums
    // so positional consumers of (keys, count, sums...) are unmoved.
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c).cast("double")).as(s"sum_$c")) ++
          sumCols.map(c => count(col(c)).as(s"_nn_$c")): _*)
  }

  /** The maintained MIN/MAX view of `base.groupBy(keys)`: per key,
    * `_ia_count` plus `min_<c>`/`max_<c>` (doubles). MIN/MAX are NOT
    * distributive under deletion — a retracted minimum needs the base
    * table to find the runner-up — so [[advanceMinMax]] takes the new
    * base snapshot and repairs exactly the AFFECTED keys from it.
    */
  def minMaxView(base: DataFrame, keys: Seq[String],
                 cols: Seq[String]): DataFrame = {
    requireMaintainable(base, cols, "min/max")
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        cols.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c"))): _*)
  }

  /** [[minMaxView]] advanced by `feed`, with base-assisted repair —
    * the partial-recompute form of IVM for non-distributive
    * aggregates:
    *
    *  - inserts / update post-images only ever IMPROVE an extremum →
    *    fold them in with min/max, no base access;
    *  - a delete / update pre-image that TIES the stored extremum may
    *    have been its last witness → that key is "damaged" and its
    *    row is recomputed from `newBase` (a semi-join against the
    *    damaged-key set — O(affected keys' rows), never a full scan);
    *  - keys whose rows all left drop out via the maintained count.
    *
    * Equals `minMaxView(newBase, keys, cols)` exactly.
    */
  def advanceMinMax(prev: DataFrame, feed: DataFrame, newBase: DataFrame,
                    keys: Seq[String], cols: Seq[String]): DataFrame = {
    requirePreimageFeed(feed)
    requireMaintainable(feed, cols, "min/max")
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    // materialized ONCE: the delta feeds both the merge join and the
    // damaged-key detection below — unmaterialized, the whole feed
    // pipeline (version reconstruction, fingerprint anti-join, preimage
    // join) executes twice per refresh. The delta is aggregate-sized
    // (one row per touched key), so the checkpoint is delta-bounded.
    val delta = feed
      .withColumn("_w", w)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_w")).as(s"d_$countCol"),
        cols.flatMap(c => Seq(
          min(when(col("_w") === 1L, col(c).cast("double")))
            .as(s"in_min_$c"),
          max(when(col("_w") === 1L, col(c).cast("double")))
            .as(s"in_max_$c"),
          min(when(col("_w") === -1L, col(c).cast("double")))
            .as(s"out_min_$c"),
          max(when(col("_w") === -1L, col(c).cast("double")))
            .as(s"out_max_$c"))): _*)
      .localCheckpoint(true)
    // prev is referenced twice as well (the merge and the damage
    // detection) — without this the stored-view subtree (version
    // reconstruction + base aggregate) executes twice per refresh;
    // the checkpoint is view-sized
    val prev0 = prev.localCheckpoint(true)
    val joined = fullOuterNullSafe(prev0, delta, keys)
    val newCount =
      (coalesce(col(countCol), lit(0L)) +
        coalesce(col(s"d_$countCol"), lit(0L))).as(countCol)
    // a key is damaged iff any retraction touches its stored extremum
    // (foldLeft: cols = Nil legally maintains a count-only view with
    // nothing to damage)
    val damaged = cols.map(c =>
      (col(s"out_min_$c").isNotNull && (col(s"min_$c").isNull ||
        col(s"out_min_$c") <= col(s"min_$c"))) ||
      (col(s"out_max_$c").isNotNull && (col(s"max_$c").isNull ||
        col(s"out_max_$c") >= col(s"max_$c"))))
      .foldLeft(lit(false))(_ || _)
    val merged = joined
      .withColumn("_damaged", coalesce(damaged, lit(false)))
      .select((keys.map(col) :+ newCount :+ col("_damaged")) ++
        cols.flatMap(c => Seq(
          least(col(s"min_$c"), col(s"in_min_$c")).as(s"min_$c"),
          greatest(col(s"max_$c"), col(s"in_max_$c")).as(s"max_$c"))): _*)
      .filter(col(countCol) > 0)
    val healthy = merged.filter(!col("_damaged")).drop("_damaged")
    // the damaged-key SET is derivable from the delta side alone
    // joined to prev's stored extrema — only a feed retraction can
    // damage a key — so it is a DELTA-sized left join rather than a
    // second reference to the full-outer `merged` subtree: the
    // view-sized join appears exactly once in the output plan (the
    // healthy branch). A damaged key whose rows all left contributes
    // no base rows below and so, correctly, no repaired row.
    val dd = delta.alias("_ia_d")
    val pp = prev0.alias("_ia_p")
    val dkCond = keys.map(c => col(s"_ia_d.$c") <=> col(s"_ia_p.$c"))
      .foldLeft(lit(true))(_ && _)
    val damagedFromDelta = cols.map(c =>
      (col(s"_ia_d.out_min_$c").isNotNull &&
        (col(s"_ia_p.min_$c").isNull ||
          col(s"_ia_d.out_min_$c") <= col(s"_ia_p.min_$c"))) ||
      (col(s"_ia_d.out_max_$c").isNotNull &&
        (col(s"_ia_p.max_$c").isNull ||
          col(s"_ia_d.out_max_$c") >= col(s"_ia_p.max_$c"))))
      .foldLeft(lit(false))(_ || _)
    val damagedKeys = dd.join(pp, dkCond, "left_outer")
      .filter(coalesce(damagedFromDelta, lit(false)))
      .select(keys.map(c => col(s"_ia_d.$c").as(c)): _*)
    // partial recompute: ONLY the damaged keys' rows leave the base —
    // null-safe keys, or a damaged NULL-key group's base rows would
    // never match and the group would silently vanish from the view
    val b = newBase.alias("_ia_b")
    val k = damagedKeys.alias("_ia_k")
    val semiCond = keys.map(c => col(s"_ia_b.$c") <=> col(s"_ia_k.$c"))
      .foldLeft(lit(true))(_ && _)
    // broadcast the damaged-key set: it is DELTA-bounded (only feed
    // retractions damage keys — the O(delta) contract this operator
    // already assumes), while the unhinted semi-join sort-merged and
    // shuffled the full base snapshot to repair a handful of keys
    val repaired = minMaxView(
      b.join(broadcast(k), semiCond, "left_semi"), keys, cols)
    healthy.unionByName(repaired)
  }

  val multCol = "_ia_mult"

  /** The maintained side table backing exact per-key
    * COUNT(DISTINCT `valueCol`): one row per LIVE (keys, value) pair
    * with its multiplicity (how many base rows witness it). SQL
    * COUNT(DISTINCT) ignores nulls, so null values never enter the
    * state. Any value type works — no numeric contract here, the
    * state only counts witnesses. Build once from the initial
    * snapshot, then advance with [[advanceDistinct]]; read the
    * distinct counts off with [[readDistinct]].
    */
  def distinctState(base: DataFrame, keys: Seq[String],
                    valueCol: String): DataFrame =
    base.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(multCol))

  /** [[distinctState]] advanced by `feed` (a change feed WITH
    * pre-images): feed weights (+1 insert/post-image, −1
    * delete/pre-image) move per-(keys, value) multiplicities; pairs
    * whose multiplicity reaches zero leave the state — including the
    * old value of an update that CHANGED the column, whose pre-image
    * retracts it while the post-image admits the new value. Equals
    * `distinctState(newSnapshot, keys, valueCol)` exactly. One keyed
    * join of two delta/state-sized relations — O(delta + state),
    * never a base-table scan.
    */
  def advanceDistinct(prev: DataFrame, feed: DataFrame, keys: Seq[String],
                      valueCol: String): DataFrame = {
    requirePreimageFeed(feed)
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    val delta = feed.filter(col(valueCol).isNotNull)
      .withColumn("_w", w)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(sum(col("_w")).as(s"d_$multCol"))
    fullOuterNullSafe(prev, delta, keys :+ valueCol)
      .select((keys :+ valueCol).map(col) :+
        (coalesce(col(multCol), lit(0L)) +
          coalesce(col(s"d_$multCol"), lit(0L))).as(multCol): _*)
      .filter(col(multCol) > 0)
  }

  /** Per-key COUNT(DISTINCT) off the maintained state: the state's
    * row count per key, as `distinct_<valueCol>`. Keys with no live
    * non-null value simply don't appear — exactly what a GROUP BY
    * over the base would produce for COUNT(DISTINCT) readers that
    * drop empty groups (a key's group exists in SQL, with count 0,
    * only if the key has OTHER live rows; join against [[view]]'s
    * `_ia_count` when that distinction matters).
    */
  def readDistinct(state: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame =
    state.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"distinct_$valueCol"))

  /** `prev` advanced by `feed` (a change feed WITH pre-images over the
    * same key set). Equals `view(newSnapshot, keys, sumCols)` exactly
    * for any feed produced between the snapshots the view has seen.
    */
  def advance(prev: DataFrame, feed: DataFrame, keys: Seq[String],
              sumCols: Seq[String]): DataFrame = {
    requirePreimageFeed(feed)
    requireMaintainable(feed, sumCols, "sum")
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    val delta = feed
      .withColumn("_w", w)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_w")).as(s"d_$countCol"),
        sumCols.map(c =>
          sum(col(c) * col("_w").cast("double")).as(s"d_sum_$c")) ++
          sumCols.map(c =>
            sum(when(col(c).isNotNull, col("_w")).otherwise(lit(0L)))
              .as(s"d_nn_$c")): _*)
    // full outer: keys new to the view (pure inserts) and keys leaving
    // it (all rows deleted) both flow through one join of two
    // aggregate-sized relations
    val joined = fullOuterNullSafe(prev, delta, keys)
    val newCount =
      (coalesce(col(countCol), lit(0L)) +
        coalesce(col(s"d_$countCol"), lit(0L))).as(countCol)
    val newNns = sumCols.map { c =>
      (coalesce(col(s"_nn_$c"), lit(0L)) +
        coalesce(col(s"d_nn_$c"), lit(0L))).as(s"_nn_$c")
    }
    val newSums = sumCols.map { c =>
      // both sides null-coalesce for the arithmetic (a key absent
      // from the delta keeps its old sum, a new key starts from 0) —
      // but the RESULT is NULL whenever zero non-null witnesses
      // remain, exactly as a recompute's SUM over an all-NULL (or
      // emptied) measure would be; without the witness count, 0.0 and
      // "no measured values" are indistinguishable here
      when(coalesce(col(s"_nn_$c"), lit(0L)) +
          coalesce(col(s"d_nn_$c"), lit(0L)) > 0L,
        coalesce(col(s"sum_$c"), lit(0.0)) +
          coalesce(col(s"d_sum_$c"), lit(0.0)))
        .otherwise(lit(null).cast("double")).as(s"sum_$c")
    }
    joined
      .select((keys.map(col) :+ newCount) ++ newSums ++ newNns: _*)
      .filter(col(countCol) > 0)
  }
}
