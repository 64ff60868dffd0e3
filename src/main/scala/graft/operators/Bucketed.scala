package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shuffle-free co-located joins via bucketed tables.
  *
  * A `groupBy`/`join` on an unbucketed table shuffles the FULL fact
  * table on every query — at 100 TB that exchange, not the join
  * itself, is the bill. Writing the table bucketed (hash-partitioned
  * into a fixed bucket count on the join key, persisted in the
  * catalog) pays the shuffle ONCE at write time; every later
  * equi-join or aggregation on that key reads the co-located buckets
  * directly and plans with **zero Exchange**. `sortBy` additionally
  * persists within-bucket order so single-file buckets skip the
  * sort-merge join's Sort.
  *
  * This is the standing-table complement to [[Skew.saltedJoin]]
  * (one-shot skew relief) and `repartition` (per-query co-location):
  * use it for the fact tables a pipeline joins repeatedly on the same
  * key — e.g. the rides/events stores every gold query keys by
  * entity id.
  *
  * Both sides of a join must agree on bucket COUNT (or be integer
  * multiples, with `spark.sql.bucketing.coalesceBucketsInJoin
  * .enabled`) and key for the exchange to be elided; a mismatch
  * silently falls back to a plain shuffle, so [[assertCoLocated]]
  * exists to make the plan property testable instead of assumed
  * (PlanAuditSpec-style).
  */
object Bucketed {

  /** Persist `df` as a parquet-backed managed table bucketed (and
    * within-bucket sorted) on `key`. Overwrites any previous table of
    * the same name. Bucket count is a LAYOUT contract, not a tuning
    * knob per query — pick it once per table so all co-bucketed
    * joins agree (at 100 TB: total size / ~128 MB target files).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // A crashed (or simply previous) JVM can leave the managed-table
    // DIRECTORY on disk with no entry in this session's catalog;
    // saveAsTable refuses to adopt such an orphan location
    // (LOCATION_ALREADY_EXISTS) rather than overwrite data it has no
    // metadata for. The catalog is authoritative here: no entry means
    // the directory is dead layout, so reclaim it before writing.
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // pre-partition on the bucketing hash so each write task holds
    // exactly one bucket's rows — `buckets` files instead of
    // tasks×buckets splinters (the small-files tax matters at 100 TB:
    // bucketed scans open every file of every touched bucket)
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** [[writeBucketed]] only if `table` isn't already in the session
    * catalog — the write-once half of bucketing's contract (pay the
    * layout shuffle once, run every later join/agg shuffle-free).
    * Callers that re-derive the same table each run (benchmarks, the
    * Verify harness) go through this so repetition measures the
    * CO-LOCATED QUERY, not a redundant rewrite. The caller owns
    * naming: a table name must pin its source (e.g. carry the input
    * path's hash) since an existing name is trusted as-is.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, key, buckets)

  /** Inner equi-join of two co-bucketed tables on `key`. The result
    * is a plain join — the value is the PLAN: with both sides
    * bucketed on `key` at the same count, the planner reads buckets
    * as pre-partitioned splits and emits no Exchange on either side.
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Throws if `df`'s static physical plan still contains a shuffle —
    * the guard against the silent fallback modes (bucket-count
    * mismatch, bucketing disabled, a non-equi condition) that turn a
    * "co-located" join back into a full exchange without any error.
    */
  def assertCoLocated(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"join expected to be co-located but the plan shuffles:\n$plan")
    df
  }
}
