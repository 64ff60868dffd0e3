package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Keyed upsert (the reference's Delta `MERGE ... WHEN MATCHED UPDATE
  * ALL WHEN NOT MATCHED INSERT ALL`,
  * /root/reference/src/03_gold_realtime_rides.py:104-112) rebuilt on
  * plain parquet.
  *
  * Semantics: `merge(base, updates, keys)` = every key of `updates`
  * takes the updates row; keys only in `base` keep the base row. This
  * is a full-outer equi-join with per-column coalesce preferring the
  * updates side.
  *
  * Scale design (100 TB target):
  *  - The updates side of a streaming micro-batch is small → Spark
  *    broadcasts it (we hint explicitly), so the merge never shuffles
  *    the large base table.
  *  - [[ParquetUpsertSink]] partitions the table by a date column and
  *    rewrites ONLY partitions touched by the batch (partition-pruned
  *    read + per-partition atomic swap) — the rewrite cost is
  *    O(touched partitions), not O(table), matching Delta MERGE's
  *    file-level rewrite granularity.
  *  - Idempotence per micro-batch: the sink records the last committed
  *    batchId and skips replays, preserving exactly-once on restart.
  */
object Upsert {

  /** Pure merge: rows of `updates` win on key collision.
    *
    * Formulated as `updates ∪ (base anti-join updates-keys)` rather
    * than a full-outer join with per-column coalesce: the two are
    * semantically identical (every updates key takes the whole
    * updates row; base-only keys keep the base row), but Spark cannot
    * broadcast a full-outer join — the hint is silently dropped and
    * the base table gets shuffled. A LEFT ANTI join against the tiny
    * key set broadcasts fine, so the large base side is scanned once
    * with no shuffle.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(updates.columns.sorted.sameElements(base.columns.sorted),
      s"schema mismatch: base=${base.columns.mkString(",")} updates=${updates.columns.mkString(",")}")
    val cols = base.columns.map(col).toSeq
    val updKeys = broadcast(updates.select(keys.map(col): _*))
    base.join(updKeys, keys, "left_anti")
      .select(cols: _*)
      .unionByName(updates.select(cols: _*))
  }
}

/** File-backed upsert table with partition-granular rewrites and
  * batch-id idempotence — the stand-in for the reference's Delta gold
  * table. Pass `partitionCol = None` for a small, single-directory
  * table (faithful to the demo scale); give a low-cardinality
  * derived column (e.g. `to_date(window_start)`) for the scale path.
  */
class ParquetUpsertSink(path: String, keys: Seq[String],
                        partitionCol: Option[String] = None) {

  private def fs(spark: SparkSession) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitMarker = new Path(path, "_graft_commit")

  def lastBatchId(spark: SparkSession): Long = {
    val f = fs(spark)
    if (!f.exists(commitMarker)) -1L
    else {
      val in = f.open(commitMarker)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private def writeMarker(spark: SparkSession, batchId: Long): Unit = {
    val f = fs(spark)
    val out = f.create(commitMarker, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  def exists(spark: SparkSession): Boolean = {
    val f = fs(spark)
    f.exists(new Path(path)) && f.listStatus(new Path(path))
      .exists(s => s.getPath.getName.endsWith(".parquet") ||
        (s.isDirectory && s.getPath.getName.contains("=")))
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  /** Upsert one batch. Replayed batchIds (crash between sink commit
    * and checkpoint commit) are skipped — the micro-batch output for a
    * given id is deterministic, so skipping preserves exactly-once.
    */
  def upsert(spark: SparkSession, updates: DataFrame, batchId: Long = 0L): Unit = {
    if (batchId <= lastBatchId(spark)) return
    if (!exists(spark)) {
      // First batch: plain create (03_gold_realtime_rides.py:97-99).
      val w = updates.write.mode("overwrite")
      partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
    } else partitionCol match {
      case None =>
        val merged = Upsert.merge(read(spark), updates, keys)
          .localCheckpoint(true) // materialize before overwriting input files
        merged.write.mode("overwrite").parquet(path)
      case Some(pc) =>
        // Partition-granular merge: read ONLY the partitions the batch
        // touches (partition-pruned scan), merge, dynamic-overwrite
        // just those partitions. Untouched partitions are never read
        // or rewritten.
        val touched = updates.select(pc).distinct().collect().map(_.get(0))
        val base = read(spark).filter(col(pc).isInCollection(touched.toSeq))
        val merged = Upsert.merge(base, updates, keys).localCheckpoint(true)
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try merged.write.mode("overwrite").partitionBy(pc).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key) // don't leak dynamic mode
        }
    }
    writeMarker(spark, batchId)
  }
}
