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
  *  - Concurrency: version claims are ATOMIC compare-and-swap
  *    (tmp-write + rename-without-overwrite, the same primitive
  *    Delta's HDFS LogStore uses) — exactly one concurrent writer
  *    wins each version on stores with atomic rename. The versioned
  *    (unpartitioned) layout is fully multi-writer: a loser discards
  *    its orphan snapshot, re-merges against the winner's state, and
  *    retries the next version. The partitioned layout rewrites data
  *    files IN PLACE, where optimistic retry is UNSOUND — writer A
  *    can overwrite a shared partition between writer B's overwrite
  *    and B's claim, so even a writer that WINS its claim may have
  *    had its partitions clobbered, and the loser's retry re-merges
  *    against a base that already lost them. Partitioned writers are
  *    therefore serialized through an exclusive writer-lock file
  *    (mutual exclusion, the only sound multi-writer contract for
  *    in-place rewrites); the failed-claim CME remains the backstop
  *    against external writers that bypass the lock.
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
  *  - `partitionCol = None`: uniquely-named snapshot directories
  *    (`v<version>-<uuid>`, recorded in the commit file), whole-table
  *    snapshot per commit — right for small/medium aggregate tables,
  *    and safe under concurrent writers (see Concurrency above).
  *  - `partitionCol = Some(c)`: data lives partitioned in place and
  *    merges rewrite only touched partitions (dynamic partition
  *    overwrite); commits then track batchId for idempotence, with
  *    atomicity at partition granularity (the overwrite committer's
  *    guarantee) rather than table granularity.
  */
/** @param retainVersions how many committed versions (snapshot dirs +
  *   commit files) GC keeps, newest first. 2 is the single-writer
  *   minimum (one spare for readers started before the last commit);
  *   raise it under writer contention — a loser's lazily-scanned
  *   merge base survives `retainVersions - 1` further commits, and
  *   for time travel ([[readVersion]]).
  */
/** @param autoCompact hands-free OPTIMIZE (the Delta autoCompact
  *   analog, versioned layout): after a successful upsert whose new
  *   snapshot holds more than `files` small files, immediately run
  *   [[compact]] with the given layout spec — a streaming sink then
  *   never accumulates micro-batch fragmentation without operator
  *   intervention. Compaction rides the normal commit protocol
  *   (losing its version race to a concurrent writer just abandons
  *   the attempt), so auto mode adds no new failure surface.
  */
/** @param maxBytesPerRun (partitioned layout) byte budget per rewrite
  *   round, the [[ParquetUpsertSink.compactPartitions]] knob — a
  *   pathologically fragmented table's first hands-free compaction
  *   then proceeds in bounded groups instead of materializing its
  *   whole rewrite set in one shot. None = single round.
  */
final case class AutoCompact(files: Int,
                             targetFileBytes: Long = 128L * 1024 * 1024,
                             clusterBy: Seq[String] = Nil,
                             zorder: Boolean = false,
                             maxBytesPerRun: Option[Long] = None)

/** @param bloomCols columns to maintain per-file bloom filters for
  *   (the Delta bloom-index analog, [[FileSkipping.writeBlooms]]):
  *   every commit path that writes a stats manifest also builds
  *   blooms over these columns, and [[scan]]'s pruner consults them
  *   on equality predicates — the channel that prunes point lookups
  *   on HIGH-CARDINALITY keys where min/max cannot (every file's
  *   range spans the keyspace unless the table is clustered on
  *   exactly that key). Pick them per table like Delta does: the
  *   lookup keys, not everything.
  */
/** @param retainHistory (partitioned layout only) keep the files each
  *   commit replaces, frozen under `_history/v<version>/` by
  *   metadata-only renames, with a per-commit add/remove actions log
  *   ([[PartitionedHistory]]) — giving the in-place layout the
  *   versioned layout's whole capability set: time travel
  *   ([[readVersion]]), change feed ([[changeFeed]]), restore, and —
  *   as a byproduct of the write-ahead intent + rollback recovery —
  *   TABLE-granularity crash atomicity (a torn multi-partition batch
  *   is rolled back to the last commit instead of left partially
  *   applied). Retention follows `retainVersions`, the versioned
  *   layout's contract. Cost per commit: O(touched files) renames and
  *   one small JSON record — never a byte copied; history bytes are
  *   bounded by the replaced data of the retained commits and
  *   reclaimed by the same GC. Plain `spark.read.parquet(path)` still
  *   works: `_history` is underscore-hidden.
  */
class ParquetUpsertSink(path: String, keys: Seq[String],
                        partitionCol: Option[String] = None,
                        retainVersions: Int = 2,
                        autoCompact: Option[AutoCompact] = None,
                        bloomCols: Seq[String] = Nil,
                        retainHistory: Boolean = false) {
  require(retainVersions >= 2,
    s"retainVersions must be >= 2 (got $retainVersions): the previous " +
      "version must survive for in-flight readers")
  require(autoCompact.forall(_.files > 0),
    "autoCompact.files must be positive")
  require(autoCompact.forall(_.maxBytesPerRun.forall(_ > 0)),
    "autoCompact.maxBytesPerRun must be positive")
  require(!retainHistory || partitionCol.nonEmpty,
    "retainHistory applies to the partitioned layout; the versioned " +
      "layout keeps history through its immutable snapshots already")

  private def fs(spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir = new Path(path, "_commits")

  /** (version, batchId, dataDir) of all commits, ascending by
    * version. The commit file's content is
    * `<batchId> <dataDir> [<epochMillis> <operation>]` (the trailing
    * pair feeds [[history]]; partitioned commits carry `-` for the
    * dir they don't have); dataDir is the UNIQUELY-NAMED snapshot
    * directory the version points at (absent in the legacy
    * single-writer format, which used
    * the fixed name `v<version>` — still parsed for old tables).
    * Unique names are what make racing writers safe: each attempt
    * writes its own directory, so a loser can discard its orphan
    * without ever touching the winner's data. Torn commit files (a
    * writer died between create and write — possible on stores
    * without atomic rename) are SKIPPED, not fatal: the table stays
    * readable at the last good version.
    */
  private def commits(spark: SparkSession): Seq[(Long, Long, String)] = {
    val f = fs(spark)
    if (!f.exists(commitsDir)) Seq.empty
    else f.listStatus(commitsDir).toSeq
      .flatMap { s =>
        scala.util.Try {
          val v = s.getPath.getName.toLong
          val in = f.open(s.getPath)
          val content = try new String(in.readAllBytes(), "UTF-8").trim
          finally in.close()
          val parts = content.split("\\s+")
          (v, parts(0).toLong,
            if (parts.length > 1) parts(1) else s"v$v")
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

  /** Predicate-pruned read (versioned layout): consult the snapshot's
    * per-file stats manifest ([[FileSkipping]], written atomically
    * with each commit) and enumerate ONLY files whose min/max/null
    * stats admit a matching row, then apply the predicate to the
    * survivors. Semantically identical to `read(spark).filter(pred)`;
    * at 100 TB the difference is that pruned files cost zero scheduled
    * tasks, zero opens, zero footer fetches — with a
    * [[compact]] `clusterBy`/`zorder` layout a point/range query
    * touches O(matching) files instead of O(table). Tables without
    * stats (legacy snapshots, collection failures) and the
    * partitioned layout (where directory-level partition pruning
    * already does this job) fall back to the full scan + filter.
    */
  def scan(spark: SparkSession, predicate: org.apache.spark.sql.Column)
      : DataFrame = partitionCol match {
    case Some(pc) =>
      partitionedFileSelection(spark, pc, predicate) match {
        case None => read(spark).filter(predicate)
        case Some((kept, total)) if kept.size == total =>
          read(spark).filter(predicate)
        case Some((kept, _)) if kept.isEmpty =>
          emptyLike(spark, read(spark).schema)
        case Some((kept, _)) =>
          // basePath keeps the partition column derivable from the
          // kept leaf-file paths
          spark.read.option("mergeSchema", "true")
            .option("basePath", path)
            .parquet(kept.map(k => s"$path/$k"): _*)
            .filter(predicate)
      }
    case None => commits(spark).lastOption match {
      case None => read(spark).filter(predicate)
      case Some((_, _, dir)) =>
        val (kept, total) = scanFileSelection(spark, dir, predicate)
        if (kept.size == total) // nothing pruned (or no stats)
          spark.read.parquet(s"$path/$dir").filter(predicate)
        else if (kept.isEmpty) // stats prove no file can match
          emptyLike(spark, spark.read.parquet(s"$path/$dir").schema)
        else
          spark.read.parquet(kept.map(f => s"$path/$dir/$f"): _*)
            .filter(predicate)
    }
  }

  private def emptyLike(spark: SparkSession,
                        schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** The predicate as the optimizer sees it over `df` — resolved,
    * literal casts folded, unsatisfiable conditions collapsed.
    */
  private sealed trait EffPred
  private case object PredEmpty extends EffPred   // provably no rows
  private case object PredUnknown extends EffPred // no Filter derivable
  private final case class PredCond(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
    extends EffPred

  private def effectivePredicate(df: DataFrame,
      predicate: org.apache.spark.sql.Column): EffPred = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Filter => LFilter, LocalRelation}
    val plan = df.filter(predicate).queryExecution.optimizedPlan
    if (plan.collectFirst {
        case l: LocalRelation if l.data.isEmpty => l }.isDefined)
      PredEmpty
    else plan.collect { case f: LFilter => f.condition }
      .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
      .map(PredCond.apply).getOrElse(PredUnknown)
  }

  /** Partitioned-layout pruning decision: (kept file paths relative to
    * the table root, total files), or None when nothing can be decided
    * (no partition dirs, pc missing from schema, no Filter derivable)
    * — the caller then falls back to the plain read + filter.
    *
    * Per directory, the PARTITION VALUE parsed from the dir name
    * becomes pseudo min=max stats ([[FileSkipping.partitionColStats]])
    * merged into each file's manifest stats, so one pruner does both
    * partition pruning and data-column skipping. STALENESS GUARD: a
    * manifest is trusted only if its file names exactly match the
    * directory's current parquet listing — dynamic partition overwrite
    * writes fresh unique names, so a manifest left behind by a
    * pre-stats writer (or clobbered by one) self-invalidates into
    * keep-all-in-dir (partition-value pruning still applies via 1-row
    * surrogates).
    */
  private[graft] def partitionedFileSelection(spark: SparkSession, pc: String,
      predicate: org.apache.spark.sql.Column): Option[(Seq[String], Int)] =
    partitionedFileSelection(spark, pc, predicate, joinFilter = None)

  /** As above; `joinFilter = Some((joinKey, kind, sortedKeys))`
    * additionally applies the dynamic-file-pruning key-window check
    * per file ([[FileSkipping.mayHoldAnyKey]]) — and because each
    * file's stats are enriched with the partition-value pseudo-stats,
    * a join ON THE PARTITION COLUMN prunes whole directories through
    * the same code path. With a join filter present, a predicate the
    * optimizer absorbs entirely (e.g. `lit(true)`) still prunes by
    * keys instead of falling back.
    */
  private[graft] def partitionedFileSelection(spark: SparkSession, pc: String,
      predicate: org.apache.spark.sql.Column,
      joinFilter: Option[(String, String, Array[FileSkipping.SValue])])
      : Option[(Seq[String], Int)] = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return None
    // a crashed writer's torn directories make the live listing (and
    // its manifests) untrustworthy — decline to prune; the row-level
    // fallback routes through the consistent read
    if (pendingHistory(spark).nonEmpty) return None
    val dirs = f.listStatus(root).toSeq.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
    if (dirs.isEmpty) return None
    // one listing pass per dir (needed for the freshness checks and
    // surrogates regardless); predicate resolution then uses a single
    // sample leaf with basePath, so Spark never re-lists the table for
    // the pruning decision. Post-widening narrow files can fail that
    // resolution — fall back to the mergeSchema read (rare path).
    val listed: Seq[(String, Seq[String])] = dirs.map { d =>
      (d.getPath.getName, f.listStatus(d.getPath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName))
    }
    val firstLeaf = listed.collectFirst {
      case (dn, ns) if ns.nonEmpty => s"$path/$dn/${ns.head}"
    }
    if (firstLeaf.isEmpty) return None
    val schemaDf = scala.util.Try(
      spark.read.option("basePath", path).parquet(firstLeaf.get))
      .getOrElse(read(spark))
    if (!schemaDf.columns.contains(pc)) return None
    val eff = scala.util.Try(effectivePredicate(schemaDf, predicate))
      .orElse(scala.util.Try(effectivePredicate(read(spark), predicate)))
      .getOrElse(PredUnknown)
    val condOpt: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
      eff match {
        case PredEmpty => return Some((Seq.empty, listed.map(_._2.size).sum))
        // no Filter derivable: without a join filter nothing can be
        // decided; with one, key windows still prune (cond = TRUE)
        case PredUnknown if joinFilter.isEmpty => return None
        case PredUnknown => None
        case PredCond(c) => Some(c)
      }
    val dt = schemaDf.schema(pc).dataType
    var total = 0
    val kept = listed.flatMap { case (dirName, names) =>
      val raw = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName(
          dirName.drop(pc.length + 1))
      val manifest = FileSkipping
        .readStats(f, new Path(path, dirName))
        .filter(_.map(_.file).toSet == names.toSet)
      val files = manifest.getOrElse(
        // no trustworthy manifest: 1-row surrogates — data columns
        // cannot prune, the partition value still can
        names.map(n => FileSkipping.FileStat(n, 1L, Map.empty)))
      total += files.size
      val enriched = files.map { fileStat =>
        FileSkipping.partitionColStats(dt, raw, fileStat.rows)
          .map(p => fileStat.copy(cols = fileStat.cols + (pc -> p)))
          .getOrElse(fileStat)
      }
      val statsKept = condOpt match {
        case Some(cond) => enriched.filter(FileSkipping.mayMatch(cond, _))
        case None => enriched
      }
      // bloom refinement of the stats survivors only (lazy per-
      // file decode); blooms need no freshness guard — data files
      // are uniquely named, so a stale entry never matches a live
      // file and a new file without one simply isn't bloom-pruned
      lazy val blooms = FileSkipping.readBlooms(f, new Path(path, dirName))
        .filterNot(_.isEmpty)
      val bloomKept = (condOpt, if (statsKept.isEmpty) None else blooms) match {
        case (Some(cond), Some(bi)) => statsKept.filter(st =>
          FileSkipping.mayMatch(cond, st, bi.forFile(st.file)))
        case _ => statsKept
      }
      val keyKept = joinFilter match {
        case None => bloomKept
        case Some((jk, kind, keys)) => bloomKept.filter(st =>
          FileSkipping.mayHoldAnyKey(st, jk, kind, keys,
            blooms.flatMap(_.forFileCol(st.file, jk))))
      }
      keyKept.map(k => s"$dirName/${k.file}")
    }
    Some((kept, total))
  }

  /** DYNAMIC FILE PRUNING for a selective equi-join (the Delta/Photon
    * DFP analog): prune this table's FILES by the build side's join
    * keys BEFORE any task is scheduled, then return the row-level
    * semi-join-reduced probe side — semantically
    * `scan(predicate)` ∩ (`joinKey` ∈ `buildKeys`), so an inner
    * equi-join over the result is unchanged while the fact scan
    * touches O(matching files). At 100 TB this is the difference
    * between scanning 3 files and 800k for a star join whose dim-side
    * filter is selective: min/max windows answer in O(log |keys|) per
    * file (a sorted-key binary search, never a per-key sweep), and a
    * [[bloomCols]] index on the join key refines the few in-window
    * keys per file.
    *
    * `buildKeys` must be a single-column frame of join values (any
    * column name); it is collected DISTINCT to the driver, gated by
    * `maxKeys` — above the gate (or for key types without a stats
    * representation) the method degrades to the ordinary pruned scan
    * plus a broadcast semi-join, still correct, just not file-pruned
    * by keys. Row-level reduction uses an IN-list for small key sets
    * (codegen'd set probe) and a broadcast left-semi join for large
    * ones (a 2M-literal plan would bloat serialization).
    */
  def scanForJoin(spark: SparkSession, joinKey: String,
                  buildKeys: DataFrame,
                  predicate: org.apache.spark.sql.Column = lit(true),
                  maxKeys: Int = 2000000): DataFrame = {
    require(buildKeys.columns.length == 1,
      s"buildKeys must have exactly one column, got " +
        buildKeys.columns.mkString(","))
    val bk = buildKeys.columns.head
    val distinctKeys = buildKeys.filter(col(bk).isNotNull).distinct()
    val collected: Array[Any] =
      distinctKeys.limit(maxKeys + 1).collect().map(_.get(0))
    def semiJoined(df: DataFrame): DataFrame =
      df.join(broadcast(distinctKeys.withColumnRenamed(bk, joinKey)),
        Seq(joinKey), "left_semi")
    def rowReduced(df: DataFrame): DataFrame =
      if (collected.length <= 10000)
        df.filter(col(joinKey).isInCollection(collected.toSeq))
      else semiJoined(df)
    if (collected.length > maxKeys)
      return semiJoined(scan(spark, predicate)) // build side too large
    partitionCol match {
      case Some(pc) =>
        // same key-window + bloom machinery as the versioned layout;
        // the partition-value pseudo-stats mean a join ON the
        // partition column prunes whole directories
        val converted = scala.util.Try(read(spark).schema(joinKey).dataType)
          .toOption.flatMap(FileSkipping.keySValues(_, collected.toSeq))
        val selection = converted.flatMap { case (kind, sortedKeys) =>
          partitionedFileSelection(spark, pc, predicate,
            joinFilter = Some((joinKey, kind, sortedKeys)))
        }
        selection match {
          case None => rowReduced(scan(spark, predicate))
          case Some((kept, total)) =>
            val full = read(spark)
            if (kept.size == total) rowReduced(full.filter(predicate))
            else if (kept.isEmpty) emptyLike(spark, full.schema)
            else rowReduced(spark.read.option("mergeSchema", "true")
              .option("basePath", path)
              .parquet(kept.map(k => s"$path/$k"): _*)
              .filter(predicate))
        }
      case None => commits(spark).lastOption match {
        case None => rowReduced(read(spark).filter(predicate))
        case Some((_, _, dir)) =>
          val (kept, total) = scanForJoinSelection(spark, dir, joinKey,
            collected, predicate)
          val reduced =
            if (kept.size == total)
              rowReduced(spark.read.parquet(s"$path/$dir").filter(predicate))
            else if (kept.isEmpty)
              emptyLike(spark, spark.read.parquet(s"$path/$dir").schema)
            else rowReduced(spark.read
              .parquet(kept.map(fl => s"$path/$dir/$fl"): _*)
              .filter(predicate))
          reduced
      }
    }
  }

  /** The DFP pruning decision for one snapshot dir: files kept after
    * BOTH the base-predicate stats pruning and the join-key window +
    * bloom check, with the total — exposed for tests and skip-ratio
    * telemetry.
    */
  private[graft] def scanForJoinSelection(spark: SparkSession, dir: String,
      joinKey: String, keys: Array[Any],
      predicate: org.apache.spark.sql.Column): (Seq[String], Int) = {
    val (keptBase, total) = scanFileSelection(spark, dir, predicate)
    val f = fs(spark)
    val statsByFile = FileSkipping.readStats(f, new Path(s"$path/$dir"))
      .map(_.map(s => s.file -> s).toMap).getOrElse(Map.empty)
    val dt = scala.util.Try(read(spark).schema(joinKey).dataType).toOption
    val converted = dt.flatMap(FileSkipping.keySValues(_, keys.toSeq))
    converted match {
      case None => (keptBase, total) // untyped: no key-based pruning
      case Some((kind, sortedKeys)) =>
        val blooms = FileSkipping.readBlooms(f, new Path(s"$path/$dir"))
        val kept = keptBase.filter { fn =>
          statsByFile.get(fn).forall { st =>
            FileSkipping.mayHoldAnyKey(st, joinKey, kind, sortedKeys,
              blooms.flatMap(_.forFileCol(fn, joinKey)))
          }
        }
        (kept, total)
    }
  }

  /** [[scan]] against a RETAINED historical version — time travel and
    * data skipping compose for free: each snapshot directory carries
    * its own stats manifest, so a point lookup into last night's
    * version prunes exactly like one into today's.
    */
  def scanVersion(spark: SparkSession, version: Long,
                  predicate: org.apache.spark.sql.Column): DataFrame = {
    require(partitionCol.isEmpty,
      "time travel requires the versioned layout")
    commits(spark).find(_._1 == version) match {
      case None => readVersion(spark, version) // throws the standard error
      case Some((_, _, dir)) =>
        val (kept, total) = scanFileSelection(spark, dir, predicate)
        if (kept.size == total)
          spark.read.parquet(s"$path/$dir").filter(predicate)
        else if (kept.isEmpty)
          emptyLike(spark, spark.read.parquet(s"$path/$dir").schema)
        else
          spark.read.parquet(kept.map(f => s"$path/$dir/$f"): _*)
            .filter(predicate)
    }
  }

  /** (files kept, total files) the stats manifest admits for
    * `predicate` — the pruning decision [[scan]] acts on, exposed for
    * tests and skip-ratio telemetry. No stats ⇒ everything kept.
    *
    * The predicate is taken from the OPTIMIZED plan of
    * `snapshot.filter(predicate)`: that resolves attributes, folds
    * literal casts (`=== 500` against a bigint column arrives as a
    * typed long literal), rewrites null-safe-null to IS NULL, and —
    * when the optimizer can prove the predicate unsatisfiable —
    * collapses the plan to an empty relation, which prunes every
    * file outright. A plan with no Filter left (condition absorbed
    * some other way) conservatively keeps everything.
    */
  private[graft] def scanFileSelection(spark: SparkSession, dir: String,
      predicate: org.apache.spark.sql.Column): (Seq[String], Int) =
    FileSkipping.readStats(fs(spark), new Path(s"$path/$dir")) match {
      case None =>
        val all = fs(spark).listStatus(new Path(s"$path/$dir")).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.getName)
        (all, all.size)
      case Some(stats) =>
        // predicate resolution against ONE sample file: a versioned
        // snapshot is schema-uniform (full rewrite per version), and a
        // whole-directory read here would make Spark re-list every
        // file — O(files) driver work the pruning exists to avoid
        val predDf = stats.headOption match {
          case Some(first) => spark.read.parquet(s"$path/$dir/${first.file}")
          case None => spark.read.parquet(s"$path/$dir")
        }
        effectivePredicate(predDf, predicate) match {
          case PredEmpty => (Seq.empty, stats.size)
          case PredUnknown => (stats.map(_.file), stats.size)
          case PredCond(cond) =>
            // two passes: stats first, then the bloom index (if the
            // sink maintains one) refines the SURVIVORS on equality
            // leaves — so filter deserialization cost is proportional
            // to files the stats could not prune, never to the table
            val statsKept = stats.filter(FileSkipping.mayMatch(cond, _))
            val blooms =
              if (statsKept.isEmpty) None
              else FileSkipping.readBlooms(fs(spark),
                new Path(s"$path/$dir")).filterNot(_.isEmpty)
            val kept = blooms match {
              case None => statsKept
              case Some(bi) => statsKept.filter(st =>
                FileSkipping.mayMatch(cond, st, bi.forFile(st.file)))
            }
            (kept.map(_.file), stats.size)
        }
    }

  /** (files kept, total files) the stats manifest admits for
    * `predicate` on the CURRENT version — skip-ratio telemetry (the
    * at-scale figure of merit: every pruned file is a task, an open,
    * and a footer fetch that never happens). (0, 0) when no committed
    * version or no stats exist.
    */
  def scanFileCounts(spark: SparkSession,
                     predicate: org.apache.spark.sql.Column): (Int, Int) =
    partitionCol match {
      case Some(pc) =>
        partitionedFileSelection(spark, pc, predicate)
          .map { case (kept, total) => (kept.size, total) }
          .getOrElse((0, 0))
      case None => commits(spark).lastOption match {
        case None => (0, 0)
        case Some((_, _, dir)) =>
          val (kept, total) = scanFileSelection(spark, dir, predicate)
          (kept.size, total)
      }
    }

  /** Metadata-only row count of the current snapshot (versioned
    * layout): the sum of per-file row counts the commit-time stats
    * manifest already holds — zero tasks, zero file opens, the
    * `SELECT COUNT(*)` a 100 TB table answers from its log. None when
    * no stats exist (legacy snapshot, partitioned layout) — callers
    * fall back to `read(spark).count()`.
    */
  def countRows(spark: SparkSession): Option[Long] = partitionCol match {
    case None => commits(spark).lastOption.flatMap { case (_, _, dir) =>
      FileSkipping.readStats(fs(spark), new Path(s"$path/$dir"))
        .map(_.map(_.rows).sum)
    }
    case Some(pc) =>
      // partitioned layout: sum every directory's manifest, each
      // trusted only when FRESH (file names match the live listing —
      // the same staleness guard the pruner applies); one stale or
      // absent manifest makes the whole answer None rather than wrong
      freshPartitionManifests(spark, pc).map(_.flatten.map(_.rows).sum)
  }

  /** Per-directory FRESH stats manifests of the partitioned layout —
    * Some(list of per-dir file stats) only when EVERY partition
    * directory carries a manifest matching its live parquet listing.
    * None ⇒ metadata-only answers are unavailable (fall back to a
    * scan); also None when the table has no partition directories.
    */
  private def freshPartitionManifests(spark: SparkSession, pc: String)
      : Option[Seq[Seq[FileSkipping.FileStat]]] = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return None
    // torn directories from a crashed writer: metadata answers would
    // describe an uncommitted state — decline, callers recompute
    if (pendingHistory(spark).nonEmpty) return None
    val dirs = f.listStatus(root).toSeq.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
    if (dirs.isEmpty) return None
    val perDir = dirs.map { d =>
      val names = f.listStatus(d.getPath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName)
      FileSkipping.readStats(f, d.getPath)
        .filter(_.map(_.file).toSet == names.toSet)
    }
    if (perDir.exists(_.isEmpty)) None else Some(perDir.map(_.get))
  }

  /** Metadata-only global [min, max] of `column` on the current
    * snapshot (versioned layout) — the MIN/MAX a 100 TB table answers
    * from its log: the fold of the manifest's per-file bounds, zero
    * tasks. None when stats are absent, the column is unindexed, any
    * file's bounds are unknown (unknown files could hold the true
    * extremum), or every file is all-null. Values come back in the
    * manifest's representation: Long for integral columns, Double,
    * String, Boolean, days-since-epoch Long for dates, micros Long
    * for timestamps.
    */
  def columnBounds(spark: SparkSession, column: String)
      : Option[(Any, Any)] = partitionCol match {
    case None => commits(spark).lastOption.flatMap { case (_, _, dir) =>
      FileSkipping.readStats(fs(spark), new Path(s"$path/$dir"))
        .flatMap(FileSkipping.globalBounds(_, column))
    }
    case Some(pc) =>
      // data columns only (the partition column itself lives in dir
      // names, not footers); all manifests must be fresh and every
      // file's bounds known — the versioned path's soundness rule
      if (column == pc) None
      else freshPartitionManifests(spark, pc)
        .flatMap(per => FileSkipping.globalBounds(per.flatten, column))
  }

  def read(spark: SparkSession): DataFrame = partitionCol match {
    case None =>
      commits(spark).lastOption match {
        case Some((_, _, dir)) => spark.read.parquet(s"$path/$dir")
        case None => spark.read.parquet(path) // pre-sink external data
      }
    case Some(pc) =>
      // mergeSchema: after (or mid-crash during) a schema-widening
      // upsert, partitions may carry different footer schemas — without
      // it, whether the evolved column appears depends on which footer
      // Spark samples (nondeterministic reads). Footer-only cost,
      // proportional to file count, not bytes. _commits is _-hidden.
      val pending = pendingHistory(spark)
      if (pending.isEmpty)
        spark.read.option("mergeSchema", "true").parquet(path)
      else
        // a writer died mid-commit and no locked write has run since:
        // route around the torn directories through the frozen
        // originals — readers see the last COMMITTED state, mutating
        // nothing (recovery proper runs under the writer lock)
        readFileMap(spark, PartitionedHistory.consistentLive(fs(spark),
          new Path(path), commitsDir, pc, commits(spark).map(_._1).toSet))
  }

  /** Versions with a pending (uncommitted) history intent — nonempty
    * only between a writer crash and the next locked write's recovery.
    * Zero-cost when history is off.
    */
  private def pendingHistory(spark: SparkSession): Seq[Long] =
    if (!retainHistory) Seq.empty
    else PartitionedHistory.pendingVersions(fs(spark), commitsDir,
      commits(spark).map(_._1).toSet)

  /** Roll back incomplete history commits (writer died between intent
    * and commit claim) — runs at the start of every locked write, so
    * the table a writer merges against is always the last committed
    * state, whatever happened to its predecessor.
    */
  private def recoverIncomplete(spark: SparkSession): Unit = {
    val f = fs(spark)
    pendingHistory(spark).foreach { v =>
      val touched =
        PartitionedHistory.rollback(f, new Path(path), commitsDir, v)
      touched.foreach { d =>
        val dir = new Path(path, d)
        if (f.exists(dir)) writeIndexes(spark, dir)
      }
    }
  }

  /** Heal a table whose last writer died mid-commit without waiting
    * for the next write: takes the writer lock (recovery runs on
    * acquisition) and releases it. No-op when nothing is pending or
    * history is off.
    */
  def recoverIncompleteCommit(spark: SparkSession): Unit =
    if (retainHistory) withWriterLock(spark)(())

  /** Read a resolved file map (relpath → location under `path`): live
    * files with basePath at the table root; frozen files grouped per
    * `_history/v<w>` with basePath below the underscore segment, so
    * partition values still derive from the mirrored directory
    * structure. Groups union by name with missing-column fill — a
    * version gap that widened the schema reads back null-filled,
    * the change feed's convention.
    */
  private def readFileMap(spark: SparkSession,
                          files: Map[String, String]): DataFrame = {
    if (files.isEmpty) {
      val schema = scala.util.Try(
        spark.read.option("mergeSchema", "true").parquet(path).schema)
      return schema.map(emptyLike(spark, _)).getOrElse(spark.emptyDataFrame)
    }
    val groups = files.values.toSeq.groupBy { sub =>
      if (sub.startsWith(PartitionedHistory.historyDirName + "/"))
        sub.split('/').take(2).mkString("/") // "_history/v<w>"
      else ""
    }
    groups.toSeq.sortBy(_._1).map { case (g, subs) =>
      val bp = if (g.isEmpty) path else s"$path/$g"
      spark.read.option("mergeSchema", "true").option("basePath", bp)
        .parquet(subs.sorted.map(s => s"$path/$s"): _*)
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Escaped partition-directory name for one value of `pc` (the
    * writer's own path rendering, so lookups by name always agree
    * with what's on disk).
    */
  private def partDirName(pc: String, v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString(pc, v)

  /** Time travel (the Delta `versionAsOf` analog): read the table as
    * of a specific committed version. Only the newest `retainVersions`
    * commits are readable — older snapshots/history are GC'd.
    *
    * Versioned layout: the commit's immutable snapshot directory.
    * Partitioned layout (requires `retainHistory`): backward replay of
    * the per-commit add/remove actions from the consistent current
    * listing — each replaced file reads from its frozen home under
    * `_history/v<w>/` ([[PartitionedHistory.liveAt]]). Metadata cost
    * O(live files + retained deltas); no data is ever copied to
    * travel.
    */
  def readVersion(spark: SparkSession, version: Long): DataFrame =
    partitionCol match {
      case None => commits(spark).find(_._1 == version) match {
        case Some((_, _, dir)) => spark.read.parquet(s"$path/$dir")
        case None => throw new IllegalArgumentException(
          s"version $version of $path is not available (GC retains the " +
            s"newest $retainVersions; present: " +
            s"${commits(spark).map(_._1).mkString(",")})")
      }
      case Some(pc) =>
        require(retainHistory,
          "time travel on the partitioned layout requires " +
            "retainHistory = true (the plain layout rewrites in place " +
            "and keeps no history)")
        val cs = commits(spark)
        if (!cs.exists(_._1 == version))
          throw new IllegalArgumentException(
            s"version $version of $path is not available (GC retains " +
              s"the newest $retainVersions; present: " +
              s"${cs.map(_._1).mkString(",")})")
        val f = fs(spark)
        val current = PartitionedHistory.consistentLive(f, new Path(path),
          commitsDir, pc, cs.map(_._1).toSet)
        val files =
          if (version == cs.last._1) current
          else PartitionedHistory.liveAt(f, new Path(path), commitsDir,
            version, cs.map(_._1).sorted.reverse, current)
        readFileMap(spark, files)
    }

  /** Rows of version `to` that are NEW or CHANGED since version
    * `from` — the additive half of the change-data feed. This is what
    * keeps repeated curation affordable: a nightly quality/dedup/
    * scoring pass consumes `changesBetween(prev, current)` — typically
    * orders of magnitude smaller than the table — instead of
    * rescanning 100 TB. Rows RETRACTED between the versions (via
    * [[delete]] or an external writer) do NOT appear here; consumers
    * that must propagate deletes read [[changeFeed]] instead.
    *
    * Shape at scale: one hash-shuffle of 32-byte row fingerprints
    * (same as exact dedup) — an anti-join of the new snapshot's
    * fingerprints against the old's. The fingerprint covers the FULL
    * row (sorted-column `to_json` → sha2), so value updates surface
    * even when keys match; fingerprint equality means the row is
    * byte-identical and safely skipped.
    */
  def changesBetween(spark: SparkSession, from: Long, to: Long): DataFrame = {
    require(from <= to, s"from ($from) must be <= to ($to)")
    val (newerDf, olderDf) = deltaFrames(spark, from, to).getOrElse(
      (readVersion(spark, to), readVersion(spark, from)))
    val newer = fingerprinted(newerDf)
    val older = fingerprinted(olderDf).select(col("_fp"))
    newer.join(older, Seq("_fp"), "left_anti").drop("_fp")
  }

  /** Full row fingerprint (sorted-column to_json → sha2): equality
    * means the row is byte-identical across versions.
    */
  private def fingerprinted(df: DataFrame): DataFrame = df.withColumn("_fp",
    sha2(to_json(struct(df.columns.sorted.map(col): _*)), 256))

  /** The complete change-data feed between two committed versions —
    * the Delta CDF analog (`readChangeFeed` over the reference's MERGE
    * sink, 03_gold_realtime_rides.py:104-112). Rows carry a
    * `_change_type` column:
    *
    *  - `insert`            — key absent at `from`, present at `to`
    *  - `update_postimage`  — key present at both, any column changed
    *    (the new row image)
    *  - `delete`            — key present at `from`, absent at `to`
    *    (the old row image — what a downstream consumer must retract)
    *
    * Unlike [[changesBetween]] (new/changed rows only), this feed lets
    * an incremental consumer ALSO drop rows retracted upstream — via a
    * key anti-join of its state against the `delete` slice — instead
    * of detecting disappearance only by full recompute.
    *
    * Shape at scale: the same single fingerprint hash-shuffle as
    * `changesBetween`, one key-presence join to split inserts from
    * updates, and one reverse key anti-join for deletes — all keyed
    * shuffles of the (small) delta plus one pass over each snapshot;
    * never a cross product, never a driver collect. Schema evolution:
    * a version gap that widened the schema yields `delete` rows with
    * the new columns null-filled (`unionByName` with missing-column
    * fill), so the feed's schema is always the NEWER snapshot's.
    */
  def changeFeed(spark: SparkSession, from: Long, to: Long): DataFrame =
    changeFeed(spark, from, to, withPreimages = false)

  /** As [[changeFeed]]; `withPreimages = true` additionally emits
    * `update_preimage` rows (the OLD image of every updated key —
    * Delta CDF's fourth change type). Pre-images are what let a
    * downstream incremental AGGREGATE retract an updated row's old
    * contribution exactly ([[IncrementalAgg]]): without them, an
    * update is indistinguishable from an insert to a sum. One extra
    * keyed semi-join of the old snapshot against the changed keys —
    * still delta-sized, never a second table scan.
    */
  def changeFeed(spark: SparkSession, from: Long, to: Long,
                 withPreimages: Boolean): DataFrame = {
    require(from <= to, s"from ($from) must be <= to ($to)")
    val (newer, older) = deltaFrames(spark, from, to).getOrElse(
      (readVersion(spark, to), readVersion(spark, from)))
    changeFeedBetween(newer, older, withPreimages)
  }

  /** DELTA-PROPORTIONAL feed inputs for the partitioned history
    * layout: the files live at `to` but not at `from`, and vice versa,
    * straight from the per-commit add/remove algebra
    * ([[PartitionedHistory.liveAt]]). The layout's rewrite granularity
    * is whole partition directories — any row whose key persists
    * through a rewrite of its directory appears in a removed file (old
    * image) AND an added file (new image), while rows of untouched
    * files are byte-identical at both versions — so the fingerprint
    * anti-join and key classifications over just the differing files
    * equal the full-snapshot computation. At 100 TB that turns CDC
    * over a commit that touched 2 directories from two full table
    * scans into a read of exactly those directories' old and new
    * files. None (→ full-snapshot fallback) when the layout keeps no
    * history or a needed actions record is gone — the fallback then
    * surfaces the loud not-reconstructible error exactly as before.
    */
  private def deltaFrames(spark: SparkSession, from: Long,
                          to: Long): Option[(DataFrame, DataFrame)] =
    partitionCol match {
      case Some(pc) if retainHistory && from < to =>
        try {
          val cs = commits(spark)
          require(cs.exists(_._1 == from) && cs.exists(_._1 == to))
          val f = fs(spark)
          val current = PartitionedHistory.consistentLive(f,
            new Path(path), commitsDir, pc, cs.map(_._1).toSet)
          def at(v: Long): Map[String, String] =
            if (v == cs.last._1) current
            else PartitionedHistory.liveAt(f, new Path(path), commitsDir,
              v, cs.map(_._1).sorted.reverse, current)
          val atTo = at(to)
          val atFrom = at(from)
          Some((readFileMap(spark,
             atTo.filter { case (rel, _) => !atFrom.contains(rel) }),
           readFileMap(spark,
             atFrom.filter { case (rel, _) => !atTo.contains(rel) })))
        } catch {
          // ONLY the expected not-reconstructible cases degrade to the
          // full-snapshot path (a version written before retainHistory
          // was enabled, or whose actions record is GC'd — both raised
          // as IllegalArgumentException by liveAt / the require
          // above). Anything else (IO failure, a real bug in
          // liveAt/consistentLive) must PROPAGATE: silently eating it
          // would mask the failure behind a 2×-table-scan feed.
          case e: IllegalArgumentException =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"change feed over $path [$from, $to] falling back to " +
                s"full-snapshot diff (delta not reconstructible: " +
                s"${e.getMessage})")
            None
        }
      case _ => None
    }

  /** The feed computation proper, over the two versions' differing
    * rows ([[deltaFrames]]) or full snapshots (fallback).
    */
  private def changeFeedBetween(newer: DataFrame, older: DataFrame,
                                withPreimages: Boolean): DataFrame = {
    val changed = fingerprinted(newer)
      .join(fingerprinted(older).select(col("_fp")), Seq("_fp"), "left_anti")
      .drop("_fp")
    val oldKeys = older.select(keys.map(col): _*)
      .withColumn("_in_old", lit(1))
    val upserts = changed.join(oldKeys, keys, "left_outer")
      .withColumn("_change_type",
        when(col("_in_old").isNull, lit("insert"))
          .otherwise(lit("update_postimage")))
      .drop("_in_old")
    val deletes = older
      .join(newer.select(keys.map(col): _*), keys, "left_anti")
      .withColumn("_change_type", lit("delete"))
    val base = upserts.unionByName(deletes, allowMissingColumns = true)
    if (!withPreimages) base
    else {
      val updatedKeys = upserts
        .filter(col("_change_type") === "update_postimage")
        .select(keys.map(col): _*)
      val preimages = older.join(updatedKeys, keys, "left_semi")
        .withColumn("_change_type", lit("update_preimage"))
      val all = base.unionByName(preimages, allowMissingColumns = true)
      // Stamp the feed as pre-image-complete IN THE SCHEMA (column
      // metadata on _change_type, which survives select/filter/
      // withColumn, localCheckpoint, and a parquet round-trip). An
      // incremental-aggregate consumer ([[IncrementalAgg]]) REQUIRES
      // this marker: a feed from the two-arg overload passes a bare
      // `_change_type`-exists check yet silently inflates sums —
      // update post-images add with no matching retraction — so the
      // feed must be self-describing, not merely well-shaped.
      all.withColumn("_change_type", col("_change_type")
        .as("_change_type", ParquetUpsertSink.preimagesMetadata))
    }
  }

  /** Atomic commit point with compare-and-swap semantics: write the
    * full content to a UNIQUE dot-temp name (ignored by the commit
    * parser; unique so racing writers never clobber each other's
    * temp), then rename WITHOUT overwrite — `FileContext.rename`
    * with the default `Rename.NONE` fails if the destination exists.
    * On stores with atomic rename (HDFS and friends) exactly one
    * concurrent writer claims each version; the commit file appears
    * fully written or not at all (rename is metadata-only, so no
    * reader can observe a torn commit). Local-FS rename does an
    * existence check rather than a kernel-level exclusive rename, so
    * the local window is narrow-but-nonzero — the same caveat every
    * rename-based log protocol carries there.
    *
    * Returns false when the version was already claimed by another
    * writer (the caller's cue to re-merge and retry).
    */
  /** Claim `version` with `content` — true iff THIS writer won. The
    * atomic-exclusive publish (hard-link on local filesystems, where
    * rename silently replaces; exclusive rename elsewhere) plus the
    * torn-destination healing both live in [[AtomicClaim]].
    */
  private def tryCommit(spark: SparkSession, version: Long,
                        content: String): Boolean = {
    val f = fs(spark)
    val dst = new Path(commitsDir, version.toString)
    AtomicClaim.claim(f, spark.sparkContext.hadoopConfiguration, dst,
      content.getBytes("UTF-8"), () => parsesAsCommit(f, dst))
  }

  /** Whether `p` holds well-formed commit content (first token is the
    * batchId long) — the same criterion commits() uses to skip torn
    * files.
    */
  private def parsesAsCommit(f: org.apache.hadoop.fs.FileSystem,
                             p: Path): Boolean =
    scala.util.Try {
      val in = f.open(p)
      val content = try new String(in.readAllBytes(), "UTF-8").trim
      finally in.close()
      content.split("\\s+")(0).toLong
    }.isSuccess

  /** Drop versions (and their commit files) older than the previous
    * one — keeps a snapshot for readers started before the last
    * commit. REFERENCE-COUNTED: a snapshot dir still pointed at by a
    * retained commit survives its own version's expiry ([[restore]]
    * re-references an old dir from a new commit, Delta-style zero-copy
    * rollback — deleting it under the restored version would corrupt
    * the current table). Partitioned tables have no version
    * directories, but their commit log is trimmed the same way (only
    * the max matters for idempotence) so it cannot grow without bound.
    */
  private def gc(spark: SparkSession, cs: Seq[(Long, Long, String)]): Unit = {
    val f = fs(spark)
    val referenced = cs.takeRight(retainVersions).map(_._3).toSet
    cs.dropRight(retainVersions).foreach { case (v, _, dir) =>
      if (partitionCol.isEmpty && !referenced.contains(dir))
        f.delete(new Path(s"$path/$dir"), true)
      // a dropped commit's frozen files and actions record can never
      // be needed again: backward replay from any RETAINED version
      // only walks newer commits' actions
      if (retainHistory)
        PartitionedHistory.gcVersion(f, new Path(path), commitsDir, v)
      f.delete(new Path(commitsDir, v.toString), false)
    }
  }

  /** Unique snapshot-directory name for one commit attempt. */
  private def newDataDir(version: Long): String =
    s"v$version-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Run `body` under dynamic partition-overwrite mode, restoring the
    * session's previous setting afterwards (don't leak dynamic mode).
    */
  private def withDynamicOverwrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Commit-time index write for one data directory: the footer-stats
    * manifest, plus per-file blooms when the sink indexes any columns.
    * Both are optimizations — failures inside never fail the commit.
    */
  private def writeIndexes(spark: SparkSession, dir: Path): Unit = {
    FileSkipping.writeStats(spark, dir)
    if (bloomCols.nonEmpty) FileSkipping.writeBlooms(spark, dir, bloomCols)
  }

  /** Refresh the per-file stats manifest of the partition directories
    * named by `values` (partition values as path-rendered STRINGS —
    * the cast-to-string convention the writer's path fragments use;
    * null → the Hive default dir). Touched-partition granularity:
    * untouched directories keep their manifests, and a directory this
    * writer emptied simply no longer exists.
    */
  private def refreshPartitionStats(spark: SparkSession, pc: String,
                                    values: Seq[String]): Unit = {
    val f = fs(spark)
    values.foreach { v =>
      val dirName = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.getPartitionPathString(pc, v)
      val dir = new Path(path, dirName)
      if (f.exists(dir))
        writeIndexes(spark, dir)
    }
  }

  /** As above for a FULL-table rewrite (schema widening): refresh
    * every partition directory present on disk.
    */
  private def refreshAllPartitionStats(spark: SparkSession,
                                       pc: String): Unit = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
      .foreach(d => writeIndexes(spark, d.getPath))
  }

  /** After a successful upsert: compact immediately when the new state
    * exceeds the configured small-file budget. Runs OUTSIDE the
    * committed write (the upsert is already durable; a crash here just
    * leaves the fragmentation for the next trigger).
    *
    * Versioned layout: snapshot file count over budget → [[compact]].
    * Partitioned layout: any partition DIRECTORY over budget →
    * per-partition compaction — invoked directly on the locked body,
    * since the enclosing upsert already holds the writer lock
    * ([[withWriterLock]] is not reentrant); a lock-bypassing caller
    * (`writerLockEnabled = false`) accepts the same exposure its
    * upserts already have.
    */
  private def maybeAutoCompact(spark: SparkSession, dataDir: String): Unit =
    autoCompact.foreach { ac =>
      partitionCol match {
        case None =>
          val nFiles = fs(spark).listStatus(new Path(s"$path/$dataDir"))
            .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          if (nFiles > ac.files)
            compact(spark, ac.targetFileBytes, ac.clusterBy, ac.zorder)
        case Some(pc) =>
          val f = fs(spark)
          val root = new Path(path)
          val fragmented = f.exists(root) && f.listStatus(root).exists { s =>
            s.isDirectory && s.getPath.getName.startsWith(s"$pc=") &&
              f.listStatus(s.getPath).count(x =>
                x.isFile && x.getPath.getName.endsWith(".parquet")) > ac.files
          }
          if (fragmented)
            compactPartitionsLocked(spark, pc, ac.targetFileBytes,
              ac.clusterBy, ac.zorder, ac.maxBytesPerRun)
      }
    }

  /** Test seam: invoked after the attempt's data is fully written,
    * immediately before the commit claim — the window where a
    * concurrent writer can win the version race. No-op in production.
    */
  protected def beforeCommit(version: Long): Unit = ()

  /** Test seam: invoked after the commit log is read, immediately
    * before the attempt's data write — the window where a concurrent
    * writer can both write AND commit first. No-op in production.
    */
  protected def beforeWrite(version: Long): Unit = ()

  /** Test seam (history mode): invoked after the write-ahead intent
    * and the renames into `_history/v<version>/`, immediately before
    * the in-place data write — the widest torn window the rollback
    * protocol must heal. No-op in production.
    */
  protected def betweenHistoryMoveAndWrite(version: Long): Unit = ()

  /** Test seam (restore): invoked after the distributed copy job has
    * fully staged the re-added files, immediately before the driver
    * publishes them into the live tree — the window where the staging
    * dir is populated but no live directory has changed since the
    * freeze. No-op in production.
    */
  protected def afterRestoreStage(version: Long): Unit = ()

  /** Whether partitioned-layout writes take the exclusive writer
    * lock. Overridden false only by tests simulating an EXTERNAL
    * writer that does not honor the lock — for those, the
    * failed-claim ConcurrentModificationException stays the backstop.
    */
  protected def writerLockEnabled: Boolean = true

  private def writerLockPath = new Path(commitsDir, ".writer-lock")

  /** Serialize in-place partitioned writes: acquire the exclusive
    * lock file (same kernel-atomic create primitive as version
    * claims), run `body`, release. Waiting writers poll; a lock whose
    * holder evidently died (age beyond the staleness horizon) is
    * broken. Both horizons are session-conf-tunable — tests shorten
    * them, production defaults assume a micro-batch-scale critical
    * section.
    */
  private def withWriterLock[T](spark: SparkSession)(body: => T): T = {
    val f = fs(spark)
    if (!f.exists(commitsDir)) f.mkdirs(commitsDir)
    def conf(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
    val deadline = System.currentTimeMillis() +
      conf("graft.upsert.lockWaitMs", 180000L)
    val staleMs = conf("graft.upsert.lockStaleMs", 600000L)
    val isLocal = AtomicClaim.isLocalFs(f)
    while (!AtomicClaim.tryExclusiveCreate(f, writerLockPath, isLocal)) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.ConcurrentModificationException(
          s"timed out waiting for the writer lock on partitioned table " +
            s"$path — another writer holds ${writerLockPath}")
      val stale = scala.util.Try(f.getFileStatus(writerLockPath)).toOption
        .exists(s =>
          System.currentTimeMillis() - s.getModificationTime > staleMs)
      if (stale) f.delete(writerLockPath, false) // holder died mid-write
      Thread.sleep(100)
    }
    try {
      // under the lock, before any work: heal whatever a crashed
      // predecessor left half-applied (history mode's rollback)
      if (retainHistory) recoverIncomplete(spark)
      body
    } finally f.delete(writerLockPath, false)
  }

  /** Compaction (the Delta OPTIMIZE analog, reference D2:
    * `SET ...optimize.maxFileSize=128MB`, 03_gold_realtime_rides.py:75):
    * rewrite the current snapshot as ⌈bytes / targetFileBytes⌉ files
    * in a new committed version. Safe under the same crash protocol
    * as upserts; no-op on empty or partitioned tables (those
    * consolidate per-partition via [[compactPartitions]]).
    */
  def compact(spark: SparkSession,
              targetFileBytes: Long = 128L * 1024 * 1024,
              clusterBy: Seq[String] = Nil,
              zorder: Boolean = false): Unit = {
    if (partitionCol.nonEmpty) return
    val cs = commits(spark)
    if (cs.isEmpty) return
    val (cur, lastBatch, curDir) = cs.last
    val bytes = fs(spark).getContentSummary(new Path(s"$path/$curDir")).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val newV = cur + 1
    val dir = newDataDir(newV)
    val snapshot = spark.read.parquet(s"$path/$curDir")
    // clusterBy (the OPTIMIZE ZORDER analog for one key prefix):
    // range-partition + sort so each output file covers a DISJOINT
    // range of the cluster key — file-manifest and row-group min/max
    // stats then let a point/range predicate skip whole files ([[scan]]
    // prunes them before any task is scheduled), where coalesce would
    // leave every file spanning the full key range.
    // zorder=true with >= 2 keys interleaves equal-depth bucket ranks
    // into a space-filling-curve key ([[ZOrder]]) — each file covers a
    // hyper-rectangle, so predicates on ANY clustered column prune,
    // not just the leading one of a lexicographic sort.
    val arranged =
      if (clusterBy.isEmpty) snapshot.coalesce(nFiles)
      else if (zorder && clusterBy.size >= 2)
        ZOrder.arrange(snapshot, clusterBy, nFiles)
      else {
        val cols = clusterBy.map(col)
        snapshot.repartitionByRange(nFiles, cols: _*)
          .sortWithinPartitions(cols: _*)
      }
    arranged.write.mode("overwrite").parquet(s"$path/$dir")
    writeIndexes(spark, new Path(s"$path/$dir"))
    // compaction is an optimization: losing the version race to a
    // concurrent upsert just abandons this attempt (the upsert's
    // snapshot supersedes ours anyway)
    if (tryCommit(spark, newV,
        s"$lastBatch $dir ${System.currentTimeMillis()} compact"))
      gc(spark, cs :+ ((newV, lastBatch, dir)))
    else fs(spark).delete(new Path(s"$path/$dir"), true)
  }

  /** Per-partition compaction — OPTIMIZE for the PARTITIONED layout
    * ([[compact]] covers the versioned one): every partition directory
    * holding more files than ⌈bytes / targetFileBytes⌉ is rewritten to
    * that count, IN PLACE under the writer lock (the only sound
    * multi-writer contract for in-place rewrites), through one dynamic
    * partition overwrite — replaced files are swapped at commit, so a
    * crash mid-job leaves every partition's old content intact.
    * Untouched partitions are never read or rewritten; rewritten ones
    * get fresh stats manifests. The streaming gold sink in its
    * date-partitioned mode re-fragments each touched partition to the
    * batch's write parallelism — this is the periodic consolidation
    * that turns those task-count files back into size-targeted ones.
    * Returns the rewritten partition directory names.
    */
  /** @param clusterBy / `zorder`: in-partition layout, mirroring
    *   [[compact]]'s options — `clusterBy` range-partitions + sorts
    *   each directory's rewrite on the given data columns (tight
    *   min/max on the leading key), `zorder = true` with ≥ 2 columns
    *   interleaves them into a space-filling curve so predicates on
    *   ANY clustered column prune files WITHIN a partition directory
    *   (the partitioned layout's stats manifests + partition-value
    *   pseudo-stats then compose: directory pruning on the partition
    *   column, curve pruning inside survivors).
    * @param maxBytesPerRun bound on the bytes materialized per rewrite
    *   round: eligible directories are compacted in greedily-packed
    *   groups of at most this many input bytes, each group its own
    *   materialize + dynamic overwrite (still one writer-lock
    *   acquisition for the invocation). A heavily fragmented 100 TB
    *   table thus never pins its whole rewrite set in executor
    *   storage in one non-fault-tolerant shot — a crash between
    *   groups leaves every completed group compacted and every
    *   pending group intact. None = single round (small tables).
    */
  def compactPartitions(spark: SparkSession,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil,
      zorder: Boolean = false,
      maxBytesPerRun: Option[Long] = None): Seq[String] = {
    val pc = partitionCol.getOrElse(return Seq.empty)
    require(maxBytesPerRun.forall(_ > 0), "maxBytesPerRun must be positive")
    withWriterLock(spark) {
      compactPartitionsLocked(spark, pc, targetFileBytes, clusterBy,
        zorder, maxBytesPerRun)
    }
  }

  /** [[compactPartitions]] body — caller MUST hold the writer lock
    * (or accept lock-bypass, as the auto-compact path inside an
    * already-locked upsert does).
    */
  private def compactPartitionsLocked(spark: SparkSession, pc: String,
      targetFileBytes: Long, clusterBy: Seq[String], zorder: Boolean,
      maxBytesPerRun: Option[Long]): Seq[String] = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return Seq.empty
    val eligible = f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$pc="))
      .flatMap { d =>
        val files = f.listStatus(d.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        val bytes = files.map(_.getLen).sum
        val want = math.max(1,
          math.ceil(bytes.toDouble / targetFileBytes).toInt)
        if (files.size > want) Some((d.getPath.getName, want, bytes))
        else None
      }
    if (eligible.isEmpty) return Seq.empty
    // greedy byte-bounded grouping; a single directory larger than the
    // budget still compacts (alone in its group) — the bound caps the
    // group, it cannot make a directory uncompactable
    val groups: Seq[Seq[(String, Int, Long)]] = maxBytesPerRun match {
      case None => Seq(eligible)
      case Some(budget) =>
        val gs = Seq.newBuilder[Seq[(String, Int, Long)]]
        var cur = Vector.empty[(String, Int, Long)]
        var curBytes = 0L
        eligible.foreach { e =>
          if (cur.nonEmpty && curBytes + e._3 > budget) {
            gs += cur; cur = Vector(e); curBytes = e._3
          } else { cur = cur :+ e; curBytes += e._3 }
        }
        if (cur.nonEmpty) gs += cur
        gs.result()
    }
    groups.flatMap { group =>
      // one read over just the group's dirs; basePath derives the
      // partition column from each file's path. Materialize before
      // the overwrite swaps the input files out from under a
      // lazily-rescanned plan (the upsert path's precedent).
      val rows = spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(group.map(e => s"$path/${e._1}"): _*)
      val total = group.map(_._2).sum
      // range-partition on (pc, in-partition key): each directory's
      // rows land in contiguous tasks, so dirs get ~their ⌈share⌉ of
      // the group's file budget — and the in-partition key gives each
      // file a tight range of it
      val arranged = (if (zorder && clusterBy.size >= 2)
          ZOrder.withZColumn(rows, clusterBy)
            .repartitionByRange(total, col(pc), col(ZOrder.zColName))
            .sortWithinPartitions(col(pc), col(ZOrder.zColName))
            .drop(ZOrder.zColName)
        else {
          val inKey = if (clusterBy.nonEmpty) clusterBy else Seq(keys.head)
          val cols = col(pc) +: inKey.map(col)
          rows.repartitionByRange(total, cols: _*)
            .sortWithinPartitions(cols: _*)
        }).localCheckpoint(true)
      // history mode: each group is its own recorded commit (intent →
      // freeze → rewrite → actions → claim), so a crash between
      // groups loses nothing and time travel sees compaction as a
      // layout-only delta — identical fingerprints, an EMPTY change
      // feed across it, exactly Delta's dataChange=false
      val groupDirs = group.map(_._1)
      val csNow = if (retainHistory) commits(spark) else Seq.empty
      val newV = csNow.lastOption.map(_._1).getOrElse(-1L) + 1
      val movedRels =
        if (!retainHistory) Seq.empty[String]
        else {
          val originals = PartitionedHistory.listDirFiles(f, root, groupDirs)
          PartitionedHistory.writeIntent(f, commitsDir, newV,
            PartitionedHistory.Intent(groupDirs, originals))
          PartitionedHistory.moveToHistory(f, root, newV, originals)
          betweenHistoryMoveAndWrite(newV)
          originals
        }
      withDynamicOverwrite(spark) {
        arranged.write.mode("overwrite").partitionBy(pc).parquet(path)
      }
      refreshPartitionStats(spark, pc, group.map { e =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(e._1.drop(pc.length + 1))
      })
      if (retainHistory) {
        PartitionedHistory.writeActions(f, commitsDir, newV,
          PartitionedHistory.Actions(
            PartitionedHistory.listDirFiles(f, root, groupDirs),
            movedRels))
        val lastStreamBatch =
          csNow.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
        if (tryCommit(spark, newV,
            s"$lastStreamBatch - ${System.currentTimeMillis()} compact")) {
          f.delete(PartitionedHistory.intentPath(commitsDir, newV), false)
          gc(spark, csNow :+ ((newV, lastStreamBatch, "")))
        } else throw new java.util.ConcurrentModificationException(
          s"concurrent writer claimed version $newV of partitioned " +
            s"table $path during compaction; route all writers through " +
            "the sink's writer lock")
      }
      groupDirs
    }
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
  def upsert(spark: SparkSession, updates: DataFrame, batchId: Long): Unit =
    if (partitionCol.nonEmpty && writerLockEnabled)
      // in-place rewrites: mutual exclusion, not optimistic retry (see
      // class doc) — the commit-log read inside the attempt happens
      // under the lock, so each writer merges against the fresh head
      withWriterLock(spark)(upsertAttempt(spark, updates, batchId,
        retriesLeft = 0))
    else
      upsertAttempt(spark, updates, batchId, retriesLeft = 5)

  /** Retract every row matching `predicate` in a new committed
    * version — the `MERGE ... WHEN MATCHED DELETE` / `DELETE FROM`
    * analog the reference's Delta sink gets for free.
    *
    * Versioned layout: CAS commit + re-merge retry, so concurrent
    * upserts and deletes serialize optimistically; the retraction then
    * surfaces to incremental consumers as `delete` rows in
    * [[changeFeed]]. Partitioned layout: same writer-lock mutual
    * exclusion as [[upsert]] (in-place rewrites cannot be rolled
    * back), rewriting ONLY the partitions that hold matching rows —
    * partition-pruned cost, with fully-emptied partitions' directories
    * dropped explicitly (dynamic overwrite only replaces partitions
    * PRESENT in the output, so an all-rows-deleted partition would
    * otherwise silently resurrect).
    */
  def delete(spark: SparkSession, predicate: org.apache.spark.sql.Column,
             batchId: Long): Unit =
    partitionCol match {
      case None => deleteAttempt(spark, predicate, batchId, retriesLeft = 5)
      case Some(pc) if writerLockEnabled =>
        withWriterLock(spark)(deletePartitioned(spark, predicate, batchId, pc))
      case Some(pc) => deletePartitioned(spark, predicate, batchId, pc)
    }

  /** Partitioned-layout delete body — MUST run under the writer lock
    * (or external coordination, for lock-bypassing callers). SQL
    * three-valued semantics as the versioned path: NULL predicate
    * verdicts KEEP the row.
    */
  private def deletePartitioned(spark: SparkSession,
                                predicate: org.apache.spark.sql.Column,
                                batchId: Long, pc: String): Unit = {
    val cs = commits(spark)
    val lastStreamBatch =
      cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
    if (batchId >= 0 && batchId <= lastStreamBatch) return // replay
    if (cs.isEmpty && !hasExternalData(spark)) return // nothing to retract
    val newV = cs.lastOption.map(_._1).getOrElse(-1L) + 1
    val base = read(spark)
    val hit = coalesce(predicate, lit(false))
    // only partitions holding at least one matching row are touched;
    // ≤ |partitions| values on the driver, the upsert path's bound.
    // Values are collected CAST TO STRING — the same rendering the
    // parquet writer uses for partition path fragments — so emptied
    // directories resolve by name without re-encoding native types
    // (e.g. a Timestamp's toString carries a trailing ".0" the path
    // never has).
    val touched = base.filter(hit)
      .select(col(pc).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val recorded = if (batchId >= 0) batchId else lastStreamBatch
    val f = fs(spark)
    if (touched.nonEmpty) {
      val scoped = base.filter(col(pc).cast("string").isInCollection(touched))
      // materialize before the overwrite deletes its own input files
      val survivors = scoped.filter(not(hit)).localCheckpoint(true)
      val kept = survivors.select(col(pc).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      val touchedDirs = touched.map(partDirName(pc, _))
      val movedRels =
        if (!retainHistory) Seq.empty[String]
        else {
          val originals = PartitionedHistory.listDirFiles(f, new Path(path),
            touchedDirs)
          PartitionedHistory.writeIntent(f, commitsDir, newV,
            PartitionedHistory.Intent(touchedDirs, originals))
          PartitionedHistory.moveToHistory(f, new Path(path), newV, originals)
          betweenHistoryMoveAndWrite(newV)
          originals
        }
      withDynamicOverwrite(spark) {
        survivors.write.mode("overwrite").partitionBy(pc).parquet(path)
      }
      // partitions whose every row matched produce no output for the
      // dynamic overwrite to replace — drop their directories (their
      // data files, in history mode, are already frozen away)
      (touched.filterNot(kept)).foreach { v =>
        f.delete(new Path(path, partDirName(pc, v)), true)
      }
      // rewritten-and-surviving directories get fresh stats manifests
      refreshPartitionStats(spark, pc, kept.toSeq)
      if (retainHistory)
        PartitionedHistory.writeActions(f, commitsDir, newV,
          PartitionedHistory.Actions(
            PartitionedHistory.listDirFiles(f, new Path(path),
              touchedDirs), movedRels))
    } else if (batchId < 0) return // no match, nothing to record
    else if (retainHistory)
      // marker commit (replay protection) with no file change — the
      // actions record must still exist for backward replay
      PartitionedHistory.writeActions(f, commitsDir, newV,
        PartitionedHistory.Actions(Nil, Nil))
    // commit the batchId marker (idempotence); a lost claim means an
    // external writer bypassed the lock — surface it, as upsert does
    if (tryCommit(spark, newV,
        s"$recorded - ${System.currentTimeMillis()} delete")) {
      if (retainHistory)
        f.delete(PartitionedHistory.intentPath(commitsDir, newV), false)
      gc(spark, cs :+ ((newV, recorded, "")))
    } else {
      throw new java.util.ConcurrentModificationException(
        s"concurrent writer claimed version $newV of partitioned table " +
          s"$path; in-place rewrites cannot be rolled back — route all " +
          "writers through the sink's writer lock")
    }
  }

  @scala.annotation.tailrec
  private def deleteAttempt(spark: SparkSession,
                            predicate: org.apache.spark.sql.Column,
                            batchId: Long, retriesLeft: Int): Unit = {
    val cs = commits(spark)
    val lastStreamBatch =
      cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
    if (batchId >= 0 && batchId <= lastStreamBatch) return // replay: already applied
    val adopt = cs.isEmpty && hasExternalData(spark)
    if (cs.isEmpty && !adopt) return // empty table: nothing to retract
    val newV = cs.lastOption.map(_._1).getOrElse(-1L) + 1
    val dataDir = newDataDir(newV)
    val base = cs.lastOption match {
      case Some((_, _, dir)) => spark.read.parquet(s"$path/$dir")
      case None => spark.read.parquet(path) // adopt
    }
    val survivors = {
      // SQL/Delta DELETE retracts only rows where the predicate is
      // TRUE; a NULL verdict (e.g. delete(col("status") === "bad") on
      // a null status) keeps the row. A bare !predicate would treat
      // NULL as "delete" — coalesce pins the three-valued logic.
      val d = base.filter(not(coalesce(predicate, lit(false))))
      // adopt-case base lives at `path` itself, under which the new
      // snapshot is written — materialize first
      if (adopt) d.localCheckpoint(true) else d
    }
    val attemptOk =
      try {
        survivors.write.mode("overwrite").parquet(s"$path/$dataDir")
        writeIndexes(spark, new Path(s"$path/$dataDir"))
        true
      } catch {
        case e: Throwable if fnfInChain(e) &&
            commits(spark).lastOption.map(_._1).getOrElse(-1L) >
              cs.lastOption.map(_._1).getOrElse(-1L) =>
          // merge base GC'd mid-write by concurrent writers — lost race
          fs(spark).delete(new Path(s"$path/$dataDir"), true)
          false
      }
    val recorded = if (batchId >= 0) batchId else lastStreamBatch
    if (attemptOk && tryCommit(spark, newV,
        s"$recorded $dataDir ${System.currentTimeMillis()} delete")) {
      gc(spark, cs :+ ((newV, recorded, dataDir)))
    } else {
      if (attemptOk) // claimed by another writer: drop the orphan snapshot
        fs(spark).delete(new Path(s"$path/$dataDir"), true)
      if (retriesLeft <= 0)
        throw new java.util.ConcurrentModificationException(
          s"gave up claiming a version of $path after repeated " +
            "concurrent-writer conflicts")
      deleteAttempt(spark, predicate, batchId, retriesLeft - 1)
    }
  }

  @scala.annotation.tailrec
  private def upsertAttempt(spark: SparkSession, updates: DataFrame,
                            batchId: Long, retriesLeft: Int): Unit = {
    val cs = commits(spark)
    // Replay guard compares against the max NON-NEGATIVE committed
    // batchId: an interleaved sentinel (-1) commit must not lower the
    // high-water mark, or a redelivered streaming batch would re-apply
    // on top of the ad-hoc write and break exactly-once. Sentinel
    // commits WRITE the carried-forward mark (not -1) so the mark also
    // survives commit-log GC of the older entries that established it.
    val lastStreamBatch =
      cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
    if (batchId >= 0 && batchId <= lastStreamBatch) {
      // The TABLE effect must not re-apply — but the replayed batch
      // must still be CONSUMED: in a streaming foreachBatch the
      // upstream stateful operators run inside this DataFrame's job,
      // and returning without an action would leave their state
      // stores uncommitted for this batch (Spark 4.1's state-store
      // commit validation fails the restarted query over exactly
      // this). The noop sink drives every partition at full speed
      // with zero write side effects.
      updates.write.format("noop").mode("overwrite").save()
      return
    }
    val newV = cs.lastOption.map(_._1).getOrElse(-1L) + 1
    // An uncommitted table with pre-existing data (external writer or
    // a pre-commit-log layout) is adopted as the merge base, never
    // clobbered.
    val adopt = cs.isEmpty && hasExternalData(spark)
    val dataDir = newDataDir(newV)
    beforeWrite(newV)
    val attemptOk: Boolean = partitionCol match {
      case None =>
        // Full new snapshot into a UNIQUELY-NAMED directory; the
        // previous version stays readable until the commit file lands,
        // so a crash here is invisible to readers — and a racing
        // writer's snapshot can never share (or clobber) our path.
        val data =
          if (newV == 0 && !adopt) updates
          else {
            val baseDf = cs.lastOption match {
              case Some((_, _, dir)) => spark.read.parquet(s"$path/$dir")
              case None => spark.read.parquet(path) // adopt
            }
            val m = Upsert.merge(baseDf, updates, keys)
            // adopt-case base lives at `path` itself, which the new
            // snapshot is written under — materialize before writing
            if (adopt) m.localCheckpoint(true) else m
          }
        try {
          data.write.mode("overwrite").parquet(s"$path/$dataDir")
          // footer-derived per-file stats (and blooms, if configured)
          // land INSIDE the snapshot dir before the commit claim —
          // published atomically with the version, powering [[scan]]'s
          // file pruning
          writeIndexes(spark, new Path(s"$path/$dataDir"))
          true
        } catch {
          case e: Throwable if fnfInChain(e) &&
              commits(spark).lastOption.map(_._1).getOrElse(-1L) >
                cs.lastOption.map(_._1).getOrElse(-1L) =>
            // The lazily-scanned merge base was GC'd mid-write by
            // concurrent writers that advanced the log (retain-2
            // keeps one spare version, so this takes TWO commits
            // during one merge). Not a failure — a lost race:
            // discard the partial snapshot and rebuild from the
            // fresh head.
            fs(spark).delete(new Path(s"$path/$dataDir"), true)
            false
        }
      case Some(pc) if newV == 0 && !adopt =>
        // First batch: create (03_gold_realtime_rides.py:97-99) — via
        // DYNAMIC overwrite, writing only the batch's own partitions.
        // A STATIC overwrite here would delete the entire path,
        // including a concurrent writer's just-committed v0 data and
        // the _commits log itself — silently clobbering the race this
        // protocol exists to detect.
        val vals = updates.select(col(pc).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val touchedDirs = vals.map(partDirName(pc, _))
        val f = fs(spark)
        if (retainHistory) {
          // nothing to move at create — the intent (with an empty file
          // list: no committed originals exist) still makes a torn v0
          // rollbackable (delete whatever was partially written)
          PartitionedHistory.writeIntent(f, commitsDir, newV,
            PartitionedHistory.Intent(touchedDirs, Nil))
          betweenHistoryMoveAndWrite(newV)
        }
        withDynamicOverwrite(spark) {
          updates.write.mode("overwrite").partitionBy(pc).parquet(path)
        }
        refreshPartitionStats(spark, pc, vals)
        if (retainHistory)
          PartitionedHistory.writeActions(f, commitsDir, newV,
            PartitionedHistory.Actions(
              PartitionedHistory.listDirFiles(f, new Path(path),
                touchedDirs), Nil))
        true
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
        val f = fs(spark)
        val updateVals = updates.select(col(pc).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        // a widening batch rewrites EVERY partition — its touched set
        // is every directory on disk plus any the batch creates
        val touchedDirs =
          if (!widens) updateVals.map(partDirName(pc, _))
          else {
            val onDisk =
              if (!f.exists(new Path(path))) Seq.empty[String]
              else f.listStatus(new Path(path)).toSeq
                .filter(s => s.isDirectory &&
                  s.getPath.getName.startsWith(s"$pc="))
                .map(_.getPath.getName)
            (onDisk ++ updateVals.map(partDirName(pc, _))).distinct
          }
        // history protocol: intent (write-ahead), metadata-only
        // renames of the files this batch replaces, THEN the in-place
        // write — `merged` is already materialized, so the moves never
        // pull files out from under a lazy plan
        val movedRels =
          if (!retainHistory) Seq.empty[String]
          else {
            val originals = PartitionedHistory.listDirFiles(f,
              new Path(path), touchedDirs)
            PartitionedHistory.writeIntent(f, commitsDir, newV,
              PartitionedHistory.Intent(touchedDirs, originals))
            PartitionedHistory.moveToHistory(f, new Path(path), newV,
              originals)
            betweenHistoryMoveAndWrite(newV)
            originals
          }
        withDynamicOverwrite(spark) {
          merged.write.mode("overwrite").partitionBy(pc).parquet(path)
        }
        // touched-partition granularity for the manifest refresh too;
        // a widening rewrite touched every partition
        if (widens) refreshAllPartitionStats(spark, pc)
        else refreshPartitionStats(spark, pc, updateVals)
        if (retainHistory)
          PartitionedHistory.writeActions(f, commitsDir, newV,
            PartitionedHistory.Actions(
              PartitionedHistory.listDirFiles(f, new Path(path),
                touchedDirs), movedRels))
        true
    }
    if (!attemptOk) {
      // lost during the snapshot write (merge base GC'd from under a
      // lazy scan) — same recovery as losing the commit claim
      if (retriesLeft <= 0)
        throw new java.util.ConcurrentModificationException(
          s"gave up claiming a version of $path after repeated " +
            "concurrent-writer conflicts")
      upsertAttempt(spark, updates, batchId, retriesLeft - 1)
    } else {
    // A sentinel write records the carried-forward high-water mark so
    // GC of older commits cannot resurrect replay of a seen batch.
    val recorded = if (batchId >= 0) batchId else lastStreamBatch
    val content =
      if (partitionCol.isEmpty)
        s"$recorded $dataDir ${System.currentTimeMillis()} upsert"
      else s"$recorded - ${System.currentTimeMillis()} upsert"
    beforeCommit(newV)
    if (tryCommit(spark, newV, content)) {
      if (retainHistory) // the write-ahead record has served its term
        fs(spark).delete(PartitionedHistory.intentPath(commitsDir, newV),
          false)
      gc(spark, cs :+ ((newV, recorded, dataDir)))
      maybeAutoCompact(spark, dataDir)
    } else partitionCol match {
      case Some(_) =>
        // same-protocol writers serialize on the writer lock, so a
        // lost claim here means an EXTERNAL writer bypassed it; the
        // in-place dynamic overwrite already rewrote shared data
        // files — that cannot be rolled back, only surfaced
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer claimed version $newV of partitioned table " +
            s"$path; in-place rewrites cannot be rolled back — route all " +
            "writers through the sink's writer lock")
      case None =>
        // versioned layout: our orphan snapshot is invisible (no commit
        // points at it) and uniquely named (never the winner's data) —
        // drop it, re-merge against the winner's state, and try the
        // next version
        fs(spark).delete(new Path(s"$path/$dataDir"), true)
        if (retriesLeft <= 0)
          throw new java.util.ConcurrentModificationException(
            s"gave up claiming a version of $path after repeated " +
              "concurrent-writer conflicts")
        upsertAttempt(spark, updates, batchId, retriesLeft - 1)
    }
    }
  }

  /** Reclaim ORPHAN snapshot directories (versioned layout) — the
    * Delta VACUUM analog, mirroring [[graft.functions.IvfIndex#vacuum]]:
    * a writer that died between writing its `v<N>-<uuid>` snapshot and
    * claiming the version (or that lost the claim and crashed before
    * its own cleanup) leaves a directory no commit references —
    * invisible to readers, leaking disk forever. Commit-time [[gc]]
    * only trims COMMITTED versions, so it never sees these.
    *
    * Safety rails (same two as the IVF index):
    *  - an in-flight writer's snapshot looks exactly like an orphan
    *    until its commit lands → only directories older than
    *    `olderThanMs` (default 1 h ≫ any snapshot write) qualify;
    *  - a directory referenced by ANY present commit is never touched,
    *    whatever its age — in-retention readers keep working.
    *
    * Returns the reclaimed directory names. No-op on the partitioned
    * layout (data lives in place; there are no snapshot dirs).
    */
  def vacuum(spark: SparkSession,
             olderThanMs: Long = 86400000L): Seq[String] = {
    if (partitionCol.nonEmpty) return Seq.empty
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return Seq.empty
    val referenced = commits(spark).map(_._3).toSet
    val horizon = System.currentTimeMillis() - olderThanMs
    val snapshotName = "^v\\d+(-[0-9a-f]{8})?$".r
    val orphans = f.listStatus(root).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && snapshotName.matches(n) &&
        !referenced.contains(n) && s.getModificationTime < horizon
    }
    orphans.foreach(s => f.delete(s.getPath, true))
    orphans.map(_.getPath.getName)
  }

  /** One row per RETAINED commit, newest first — the Delta
    * `DESCRIBE HISTORY` analog. Columns: version, batch_id,
    * operation (upsert/delete/compact/restore), committed_at,
    * data_dir. Only the newest `retainVersions` commits exist (GC
    * trims the rest with their snapshots); commits written before
    * this format carry null operation/timestamp, and partitioned
    * commits a null data_dir. Driver-side listing of ≤ retainVersions
    * files — O(1) at any table size.
    */
  def history(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val f = fs(spark)
    val rows =
      (if (!f.exists(commitsDir)) Seq.empty
       else f.listStatus(commitsDir).toSeq.flatMap { s =>
         scala.util.Try {
           val v = s.getPath.getName.toLong
           val in = f.open(s.getPath)
           val content = try new String(in.readAllBytes(), "UTF-8").trim
           finally in.close()
           val p = content.split("\\s+")
           org.apache.spark.sql.Row(v, p(0).toLong,
             if (p.length > 3) p(3) else null,
             if (p.length > 2)
               scala.util.Try(new java.sql.Timestamp(p(2).toLong))
                 .getOrElse(null)
             else null,
             if (p.length > 1 && p(1) != "-") p(1) else null)
         }.toOption
       }).sortBy(-_.getLong(0))
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("batch_id", LongType, nullable = false),
      StructField("operation", StringType),
      StructField("committed_at", TimestampType),
      StructField("data_dir", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Roll the table back to a retained `version` — the Delta
    * `RESTORE TABLE ... TO VERSION AS OF` analog (raise
    * `retainVersions` to widen the restore window). The rollback is
    * itself a NEW commit: readers are never interrupted, [[history]]
    * records it, and the change feed across the restore shows exactly
    * the retractions/re-inserts a downstream incremental consumer must
    * apply. The batchId high-water mark carries forward so streaming
    * replay protection survives the rollback.
    *
    * Versioned layout: ZERO-COPY — the new commit re-references the
    * old snapshot directory ([[gc]] is reference-counted, so the
    * shared dir survives until no retained commit points at it).
    *
    * Partitioned layout (requires `retainHistory`): a locked commit
    * through the normal history protocol whose delta is computed from
    * [[PartitionedHistory.liveAt]] — live files absent at the target
    * version are frozen (metadata renames), files the target had that
    * are now frozen are COPIED back out of their `_history/v<w>/`
    * homes (the frozen copy must stay: backward replay of versions
    * older than `w` still resolves there). Cost is O(restored delta)
    * renames + bytes, never a table rewrite; crash-safe at every step
    * under the same write-ahead-intent rollback as any other commit.
    */
  def restore(spark: SparkSession, version: Long): Unit = partitionCol match {
    case None =>
      val cs = commits(spark)
      val target = cs.find(_._1 == version).getOrElse(
        throw new IllegalArgumentException(
          s"version $version of $path is not available (GC retains the " +
            s"newest $retainVersions; present: ${cs.map(_._1).mkString(",")})"))
      if (cs.last._1 == version) return // already current
      val lastStreamBatch =
        cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
      val newV = cs.last._1 + 1
      if (tryCommit(spark, newV,
          s"$lastStreamBatch ${target._3} ${System.currentTimeMillis()} restore"))
        gc(spark, cs :+ ((newV, lastStreamBatch, target._3)))
      else throw new java.util.ConcurrentModificationException(
        s"concurrent writer claimed version $newV of $path during " +
          "restore — re-check the table state and retry")
    case Some(pc) =>
      require(retainHistory,
        "restore on the partitioned layout requires retainHistory = " +
          "true (the plain layout rewrites in place and keeps no " +
          "history to roll back to)")
      if (writerLockEnabled)
        withWriterLock(spark)(restorePartitioned(spark, version, pc))
      else restorePartitioned(spark, version, pc)
  }

  /** Partitioned-layout restore body — MUST run under the writer lock
    * (recovery of any torn predecessor has already run on lock
    * acquisition, so the live listing is trustworthy).
    */
  private def restorePartitioned(spark: SparkSession, version: Long,
                                 pc: String): Unit = {
    val cs = commits(spark)
    if (!cs.exists(_._1 == version))
      throw new IllegalArgumentException(
        s"version $version of $path is not available (GC retains the " +
          s"newest $retainVersions; present: ${cs.map(_._1).mkString(",")})")
    if (cs.last._1 == version) return // already current
    val f = fs(spark)
    val root = new Path(path)
    val current = PartitionedHistory.consistentLive(f, root, commitsDir,
      pc, cs.map(_._1).toSet)
    val targetMap = PartitionedHistory.liveAt(f, root, commitsDir,
      version, cs.map(_._1).sorted.reverse, current)
    // add/remove algebra over uniquely-named immutable files: a
    // relpath live at both versions is the same physical file — only
    // the symmetric difference moves
    val toFreeze = (current.keySet -- targetMap.keySet).toSeq.sorted
    val toAdd = (targetMap.keySet -- current.keySet).toSeq.sorted
    val lastStreamBatch =
      cs.iterator.map(_._2).filter(_ >= 0).foldLeft(-1L)(math.max)
    val newV = cs.last._1 + 1
    // parse the copy-parallelism conf BEFORE any mutation: a malformed
    // value must fail the restore as a clean no-op, not abort after
    // the intent is written and originals are frozen
    val copySlices = spark.conf
      .getOption("graft.upsert.restoreCopySlices").map(_.toInt)
      .getOrElse(math.max(1, spark.sparkContext.defaultParallelism))
    if (toFreeze.isEmpty && toAdd.isEmpty) {
      // states identical (only layout-preserving commits since) — the
      // restore is an empty delta, still recorded for backward replay.
      // The empty intent keeps the crash window uniform: a death
      // before the claim is rolled back (actions record included) by
      // the same recovery as any other commit.
      PartitionedHistory.writeIntent(f, commitsDir, newV,
        PartitionedHistory.Intent(Nil, Nil))
      PartitionedHistory.writeActions(f, commitsDir, newV,
        PartitionedHistory.Actions(Nil, Nil))
    } else {
      val touchedDirs =
        (toFreeze ++ toAdd).map(_.takeWhile(_ != '/')).distinct.sorted
      val originals = PartitionedHistory.listDirFiles(f, root, touchedDirs)
      PartitionedHistory.writeIntent(f, commitsDir, newV,
        PartitionedHistory.Intent(touchedDirs, originals))
      PartitionedHistory.moveToHistory(f, root, newV, toFreeze)
      betweenHistoryMoveAndWrite(newV)
      // Re-adds are unlisted in the intent (they were not live), so a
      // crash from here on deletes them and thaws toFreeze — exact
      // pre-restore state. The byte work runs as a SPARK JOB, not a
      // driver pool: a restore that re-adds terabytes must stream
      // executor→store at cluster aggregate bandwidth, never funnel
      // through one driver NIC. Tasks copy into a staging dir under
      // `_commits` (invisible to every reader); only after the job
      // has FULLY succeeded does the driver publish the staged files
      // into the live tree by metadata-only renames. The ordering is
      // the crash-safety argument: a failed or STRAGGLING copy task
      // can only ever write staged bytes — it cannot land a file in a
      // live directory after a later recovery's rollback scanned it —
      // and staged leftovers are reclaimed by rollback/GC with the
      // torn commit.
      // per-ATTEMPT stage dir: a retry never shares a path with a
      // zombie copy task of a failed predecessor (newStageDir doc)
      val stage = PartitionedHistory.newStageDir(commitsDir, newV)
      restoreCopyBack(spark, stage, copySlices,
        toAdd.map(rel => (new Path(root, targetMap(rel)).toString,
          new Path(stage, rel).toString)))
      afterRestoreStage(newV)
      try {
        toAdd.map(rel => new Path(root, rel).getParent).distinct
          .foreach(parent => if (!f.exists(parent)) f.mkdirs(parent))
        toAdd.foreach { rel =>
          val dst = new Path(root, rel)
          if (!f.rename(new Path(stage, rel), dst))
            throw new java.io.IOException(
              s"restore publish failed: $stage/$rel -> $dst")
        }
      } finally f.delete(stage, true)
      // emptied directories vanish; surviving touched dirs get fresh
      // index manifests
      touchedDirs.foreach { d =>
        val dir = new Path(root, d)
        if (f.exists(dir)) {
          val hasData = f.listStatus(dir).exists(s =>
            s.isFile && s.getPath.getName.endsWith(".parquet"))
          if (hasData) writeIndexes(spark, dir) else f.delete(dir, true)
        }
      }
      PartitionedHistory.writeActions(f, commitsDir, newV,
        PartitionedHistory.Actions(toAdd, toFreeze))
    }
    beforeCommit(newV)
    if (tryCommit(spark, newV,
        s"$lastStreamBatch - ${System.currentTimeMillis()} restore")) {
      f.delete(PartitionedHistory.intentPath(commitsDir, newV), false)
      gc(spark, cs :+ ((newV, lastStreamBatch, "")))
    } else throw new java.util.ConcurrentModificationException(
      s"concurrent writer claimed version $newV of partitioned table " +
        s"$path during restore; route all writers through the sink's " +
        "writer lock")
  }

  /** The restore delta's byte work, DISTRIBUTED: each (src, dst) copy
    * is a Spark task (dst always under the staging dir — the caller
    * owns the publish ordering), so a restore that re-adds terabytes
    * streams at cluster aggregate bandwidth. Slices default to one
    * task wave (`defaultParallelism`), overridable via the session
    * conf `graft.upsert.restoreCopySlices` — ScaleProof uses the knob
    * to show wall-time scales with parallelism, not
    * file count × single-pipe bandwidth. On ANY failure the staged
    * bytes are reclaimed best-effort and the error propagates: no
    * live-tree write has happened yet, so the pending intent rolls
    * back exactly as if no copy had run (a straggler task that is
    * still copying can only write MORE staged bytes, which the
    * rollback also sweeps).
    *
    * Within the staging dir each task attempt is COMMITTER-STYLE
    * isolated: the copy writes a task-attempt-unique temp name and
    * renames it onto the final staged path only when its own bytes
    * are complete. The per-attempt stage dir isolates restore
    * ATTEMPTS from each other, but not two task attempts of the SAME
    * restore (speculation, or a zombie re-run after a fetch failure
    * while the original still writes): two attempts copying the same
    * staged path through non-atomic FileUtil.copy could let the job
    * succeed while a zombie is still truncating that path, and the
    * driver's publish rename would land a torn file in the live
    * tree. With the temp+rename protocol the published file is
    * always a COMPLETED attempt's output — a loser's rename onto an
    * existing path either fails (HDFS semantics; its temp is swept)
    * or atomically replaces complete bytes with the same complete
    * bytes (POSIX semantics); a zombie's late temp re-creation only
    * adds staged bytes the stage-dir delete sweeps.
    */
  private def restoreCopyBack(spark: SparkSession, stage: Path,
                              copySlices: Int,
                              pairs: Seq[(String, String)]): Unit = {
    if (pairs.isEmpty) return
    import scala.jdk.CollectionConverters._
    // the conf object is not serializable; ship its property list and
    // rebuild per partition (same discipline as FileSkipping's
    // distributed stats collection)
    val props = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val slices = math.max(1, math.min(pairs.size, copySlices))
    try {
      spark.sparkContext.parallelize(pairs, slices).foreachPartition { it =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        props.foreach { case (k, v) => c.set(k, v) }
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => tc.taskAttemptId().toString)
          .getOrElse(java.util.UUID.randomUUID().toString.take(8))
        it.foreach { case (src, dst) =>
          val sp = new Path(src)
          val dp = new Path(dst)
          val dfs = dp.getFileSystem(c)
          dfs.mkdirs(dp.getParent)
          val tmp = new Path(dp.getParent,
            s".${dp.getName}.attempt-$attempt")
          if (!org.apache.hadoop.fs.FileUtil.copy(
              sp.getFileSystem(c), sp, dfs, tmp, false, true, c))
            throw new java.io.IOException(
              s"restore copy failed: $src -> $tmp")
          if (!dfs.rename(tmp, dp)) {
            // a sibling attempt already published this staged path —
            // drop our redundant temp; fail only if NOBODY published
            scala.util.Try(dfs.delete(tmp, false))
            if (!dfs.exists(dp))
              throw new java.io.IOException(
                s"restore stage publish failed: $tmp -> $dst")
          }
        }
      }
    } catch {
      case t: Throwable =>
        scala.util.Try(fs(spark).delete(stage, true))
        throw t
    }
  }

  /** Whether `t`'s cause chain contains a FileNotFoundException (typed
    * or named in a wrapped task-failure message).
    */
  private def fnfInChain(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[java.io.FileNotFoundException] ||
          (c.getMessage != null &&
            c.getMessage.contains("FileNotFoundException")))
        return true
      c = c.getCause
    }
    false
  }
}

object ParquetUpsertSink {

  /** Metadata key stamped on `_change_type` by the pre-image-complete
    * change feed ([[ParquetUpsertSink.changeFeed]] with
    * `withPreimages = true`) — the marker [[IncrementalAgg]] requires
    * before trusting a feed for exact update retraction.
    */
  val preimagesMetadataKey = "graft.ivm.preimages"

  private[graft] val preimagesMetadata: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean(preimagesMetadataKey, true).build()

  /** Whether `feed`'s `_change_type` column carries the pre-image
    * marker — i.e. the feed was produced by the `withPreimages = true`
    * path (possibly filtered/projected/persisted since; the metadata
    * rides the schema through all of those).
    */
  def hasPreimageMarker(feed: DataFrame): Boolean =
    feed.schema.find(_.name == "_change_type").exists(f =>
      f.metadata.contains(preimagesMetadataKey) &&
        f.metadata.getBoolean(preimagesMetadataKey))
}
