package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Keyed upsert (the reference's Delta `MERGE ... WHEN MATCHED UPDATE
  * ALL WHEN NOT MATCHED INSERT ALL`,
  * /root/reference/src/03_gold_realtime_rides.py:104-112) rebuilt on
  * plain parquet.
  *
  * Semantics: `merge(base, updates, keys)` = every key of `updates`
  * takes the updates row; keys only in `base` keep the base row.
  *
  * Scale design (100 TB target):
  *  - The updates side of a streaming micro-batch is small → the
  *    anti-join against its key set broadcasts, so the merge never
  *    shuffles the large base table.
  *  - [[ParquetUpsertSink]] partitions the table by a date column and
  *    rewrites ONLY partitions touched by the batch (partition-pruned
  *    read + dynamic partition overwrite) — rewrite cost is
  *    O(touched partitions), not O(table), matching Delta MERGE's
  *    file-level rewrite granularity. A batch that WIDENS the schema
  *    is the exception: it rewrites the whole table once so the
  *    on-disk schema stays uniform.
  *  - Unpartitioned tables commit through a versioned layout with a
  *    Delta-log-style commit directory: crash-safe (readers never see
  *    a half-written version) and snapshot-isolated.
  *  - Idempotence per micro-batch: each commit records its batchId;
  *    replays are skipped, preserving exactly-once on restart.
  *  - Concurrency: SINGLE-WRITER by design, matching the reference
  *    topology (one streaming query owns the gold table). Concurrent
  *    writers would race on the commit file (no compare-and-swap);
  *    multi-writer ACID needs a log protocol with atomic version
  *    reservation à la Delta — out of scope here.
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
    *
    * Schema evolution (the reference's `mergeSchema=true`,
    * /root/reference/src/02_silver_realtime_rides.py:114): `updates`
    * may carry a SUPERSET of the base columns — new columns are
    * appended to the schema and null-filled for pre-existing base
    * rows, exactly what Delta's additive schema merge does. Updates
    * missing a base column remain an error (that would silently drop
    * data).
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val dropped = base.columns.toSet -- updates.columns.toSet
    require(dropped.isEmpty,
      s"updates must carry every base column; missing: ${dropped.mkString(",")}")
    val added = updates.columns.filterNot(base.columns.contains)
    val widened = added.foldLeft(base)((b, c) =>
      b.withColumn(c, lit(null).cast(updates.schema(c).dataType)))
    val cols = (base.columns ++ added).map(col).toSeq
    val updKeys = broadcast(updates.select(keys.map(col): _*))
    widened.join(updKeys, keys, "left_anti")
      .select(cols: _*)
      .unionByName(updates.select(cols: _*))
  }
}

/** File-backed upsert table — the stand-in for the reference's Delta
  * gold table.
  *
  * Commit protocol (the essential slice of a Delta log): a commit is
  * a file `_commits/<version>` whose content is the batchId; the
  * current table state is defined by the HIGHEST committed version.
  * Writers fully materialize the new state BEFORE writing the commit
  * file, so a crash mid-write leaves the previous version intact and
  * visible — readers never observe a torn table. The last two
  * versions are retained (snapshot for in-flight readers), older ones
  * are garbage-collected.
  *
  *  - `partitionCol = None`: versioned directories `v0, v1, ...`,
  *    whole-table snapshot per commit — right for small/medium
  *    aggregate tables.
  *  - `partitionCol = Some(c)`: data lives partitioned in place and
  *    merges rewrite only touched partitions (dynamic partition
  *    overwrite); commits then track batchId for idempotence, with
  *    atomicity at partition granularity (the overwrite committer's
  *    guarantee) rather than table granularity.
  */
class ParquetUpsertSink(path: String, keys: Seq[String],
                        partitionCol: Option[String] = None) {

  private def fs(spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir = new Path(path, "_commits")

  /** (version, batchId) pairs of all commits, ascending by version.
    * Torn commit files (a writer died between create and write —
    * possible on stores without atomic rename) are SKIPPED, not
    * fatal: the table stays readable at the last good version.
    */
  private def commits(spark: SparkSession): Seq[(Long, Long)] = {
    val f = fs(spark)
    if (!f.exists(commitsDir)) Seq.empty
    else f.listStatus(commitsDir).toSeq
      .flatMap { s =>
        scala.util.Try {
          val v = s.getPath.getName.toLong
          val in = f.open(s.getPath)
          val b = try new String(in.readAllBytes(), "UTF-8").trim.toLong
          finally in.close()
          (v, b)
        }.toOption
      }
      .sortBy(_._1)
  }

  def currentVersion(spark: SparkSession): Long =
    commits(spark).lastOption.map(_._1).getOrElse(-1L)

  def lastBatchId(spark: SparkSession): Long =
    commits(spark).lastOption.map(_._2).getOrElse(-1L)

  def exists(spark: SparkSession): Boolean = currentVersion(spark) >= 0

  /** Data present at the table path that predates this sink's commit
    * log — an externally-written table being adopted. Must be merged
    * into, never clobbered, on the first commit.
    */
  private def hasExternalData(spark: SparkSession): Boolean = {
    val f = fs(spark)
    f.exists(new Path(path)) && f.listStatus(new Path(path)).exists { s =>
      s.getPath.getName.endsWith(".parquet") ||
        (s.isDirectory && s.getPath.getName.contains("="))
    }
  }

  def read(spark: SparkSession): DataFrame = partitionCol match {
    case None =>
      val v = currentVersion(spark)
      if (v >= 0) spark.read.parquet(s"$path/v$v")
      else spark.read.parquet(path) // pre-sink data laid down externally
    case Some(_) =>
      // mergeSchema: after (or mid-crash during) a schema-widening
      // upsert, partitions may carry different footer schemas — without
      // it, whether the evolved column appears depends on which footer
      // Spark samples (nondeterministic reads). Footer-only cost,
      // proportional to file count, not bytes. _commits is _-hidden.
      spark.read.option("mergeSchema", "true").parquet(path)
  }

  /** Atomic commit point: write to a dot-temp name (ignored by the
    * commit parser), then rename — the commit file appears fully
    * written or not at all.
    */
  private def commit(spark: SparkSession, version: Long, batchId: Long): Unit = {
    val f = fs(spark)
    val tmp = new Path(commitsDir, s".tmp-$version")
    val out = f.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    val dst = new Path(commitsDir, version.toString)
    f.delete(dst, false) // leftovers of a crashed attempt at this version
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"commit rename failed for $dst")
  }

  /** Drop versions (and their commit files) older than the previous
    * one — keeps a snapshot for readers started before the last
    * commit. Partitioned tables have no version directories, but
    * their commit log is trimmed the same way (only the max matters
    * for idempotence) so it cannot grow without bound.
    */
  private def gc(spark: SparkSession, cs: Seq[(Long, Long)]): Unit = {
    val f = fs(spark)
    cs.dropRight(2).foreach { case (v, _) =>
      if (partitionCol.isEmpty) f.delete(new Path(s"$path/v$v"), true)
      f.delete(new Path(commitsDir, v.toString), false)
    }
  }

  /** Compaction (the Delta OPTIMIZE analog, reference D2:
    * `SET ...optimize.maxFileSize=128MB`, 03_gold_realtime_rides.py:75):
    * rewrite the current snapshot as ⌈bytes / targetFileBytes⌉ files
    * in a new committed version. Safe under the same crash protocol
    * as upserts; no-op on empty or partitioned tables (partitioned
    * compaction would be per-partition — not needed at demo scale).
    */
  def compact(spark: SparkSession,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    if (partitionCol.nonEmpty) return
    val cs = commits(spark)
    if (cs.isEmpty) return
    val (cur, lastBatch) = cs.last
    val bytes = fs(spark).getContentSummary(new Path(s"$path/v$cur")).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val newV = cur + 1
    spark.read.parquet(s"$path/v$cur").coalesce(nFiles)
      .write.mode("overwrite").parquet(s"$path/v$newV")
    commit(spark, newV, lastBatch)
    gc(spark, cs :+ ((newV, lastBatch)))
  }

  /** Upsert one batch. Replayed batchIds (crash between sink commit
    * and checkpoint commit) are skipped — the micro-batch output for a
    * given id is deterministic, so skipping preserves exactly-once.
    * The commit log is read ONCE per call.
    *
    * `batchId` is REQUIRED (a default would let two bare calls
    * silently no-op the second one via the replay check): pass the
    * streaming micro-batch id, or the sentinel -1 for ad-hoc batch
    * callers that want no idempotence/replay protection.
    */
  def upsert(spark: SparkSession, updates: DataFrame, batchId: Long): Unit = {
    val cs = commits(spark)
    // Replay guard compares against the max NON-NEGATIVE committed
    // batchId: an interleaved sentinel (-1) commit must not lower the
    // high-water mark, or a redelivered streaming batch would re-apply
    // on top of the ad-hoc write and break exactly-once. Sentinel
    // commits WRITE the carried-forward mark (not -1) so the mark also
    // survives commit-log GC of the older entries that established it.
    val lastStreamBatch =
      cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
    if (batchId >= 0 && batchId <= lastStreamBatch) return
    val newV = cs.lastOption.map(_._1).getOrElse(-1L) + 1
    // An uncommitted table with pre-existing data (external writer or
    // a pre-commit-log layout) is adopted as the merge base, never
    // clobbered.
    val adopt = cs.isEmpty && hasExternalData(spark)
    partitionCol match {
      case None =>
        // Full new snapshot; previous version stays readable until the
        // commit file lands, so a crash here is invisible to readers.
        val data =
          if (newV == 0 && !adopt) updates
          else {
            val m = Upsert.merge(read(spark), updates, keys)
            // adopt-case base lives at `path` itself, which v0 is
            // written under — materialize before writing
            if (adopt) m.localCheckpoint(true) else m
          }
        data.write.mode("overwrite").parquet(s"$path/v$newV")
      case Some(pc) if newV == 0 && !adopt =>
        // First batch: plain create (03_gold_realtime_rides.py:97-99).
        updates.write.mode("overwrite").partitionBy(pc).parquet(path)
      case Some(pc) =>
        // Partition-granular merge: read ONLY the partitions the batch
        // touches (partition-pruned scan), merge, dynamic-overwrite
        // just those partitions. Untouched partitions are never read
        // or rewritten. localCheckpoint materializes the merge before
        // the overwrite deletes its input files.
        //
        // EXCEPT when the batch widens the schema: a touched-only
        // rewrite would leave untouched partitions' files on the old
        // narrow schema forever, making every later read depend on
        // schema merging. Widening is rare, so pay a one-time FULL
        // rewrite: merge against the whole table and emit every
        // partition (dynamic overwrite then rewrites them all) so the
        // on-disk schema is uniform again.
        val baseAll = read(spark)
        val widens = updates.columns.exists(c => !baseAll.columns.contains(c))
        val merged =
          if (widens)
            Upsert.merge(baseAll, updates, keys).localCheckpoint(true)
          else {
            val touched = updates.select(pc).distinct().collect().map(_.get(0))
            val base = baseAll.filter(col(pc).isInCollection(touched.toSeq))
            Upsert.merge(base, updates, keys).localCheckpoint(true)
          }
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try merged.write.mode("overwrite").partitionBy(pc).parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key) // don't leak dynamic mode
        }
    }
    // A sentinel write records the carried-forward high-water mark so
    // GC of older commits cannot resurrect replay of a seen batch.
    val recorded = if (batchId >= 0) batchId else lastStreamBatch
    commit(spark, newV, recorded)
    gc(spark, cs :+ ((newV, recorded)))
  }
}
