package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST publish mode for the streaming-admission stores — the
  * object-store-safe alternative to the default listing layout
  * ([[Dedup.admitByKeys]]'s `adm_kb=` directories + rename-as-commit
  * publishes). The default layout is correct on HDFS-semantics
  * filesystems, but on object stores rename is a copy and listing is
  * eventually consistent, so the store's source of truth must move
  * into a commit log. This mode reuses the codes stores' exact
  * discipline ([[GenerationLog]] — tmp-write + rename-without-
  * overwrite CAS on `_commits/<v>`, retention GC, orphan vacuum):
  *
  *  - ONE [[AdmissionManifest]] per generation maps every logical
  *    location to its live file list — `tail -> [files]`,
  *    `bucket addr -> [files]` — and carries the layout declaration
  *    (`nBuckets`, `maxDepth`, the per-bucket depth map), so the
  *    listing layout's `_nbuckets`/`_splits` markers fold INTO the
  *    manifest here;
  *  - data files NEVER move: every mutation (tail append, fold,
  *    compact, split, removal, expiry, stamp, rebucket) writes fresh
  *    uniquely-named directories BESIDE the live ones and commits a
  *    manifest that swaps the affected locations' file lists — O(1)
  *    publish per mutation regardless of touched files, no
  *    rename-as-commit anywhere, snapshot isolation for concurrent
  *    probes for free (a probe that resolved generation v keeps
  *    reading v's immutable files while v+1 commits; retention keeps
  *    the last [[retainVersions]] generations' files alive);
  *  - every mutation derives its output INSIDE the commit-retry
  *    attempt ([[GenerationLog.commitWithRetry]], the codes stores'
  *    append rule): a lost CAS race deletes the attempt's staging and
  *    re-derives against the winner's manifest, so commits are
  *    SERIALIZABLE — the listing layout's drain loops (a removal
  *    re-scanning until provably clean beside a concurrent fold) and
  *    its transient FAILED_READ_FILE turn failures structurally
  *    disappear, as does the decision-window split race
  *    ([[Dedup.admitByKeys]]'s re-validation loop): a completed split
  *    never deletes the files a concurrent decision is reading, and
  *    maintenance only MOVES rows, so a decision against any
  *    generation sees the complete key set.
  *
  * The admission SEMANTICS are byte-identical to the listing layout
  * (same key derivation, same routed/deep addressing, same window
  * rules — the parity spec pins it); only publication differs. Mode
  * is declared at store creation ([[Dedup.nearDupFilterBatch]]'s
  * `manifestStore` flag) and detected from the store root (`_commits`
  * exists) ever after — every maintenance entry point dispatches
  * automatically.
  */
private[graft] final class AdmissionManifestStore(storePath: String) {
  import AdmissionManifestStore._
  import Dedup.{AdmissionSplits, admissionKeyColumns}

  /** Turns commit 2-4 generations each (append, fold, compact,
    * split), so in-flight readers need more retained generations than
    * the codes stores' 2 to keep their snapshot's files alive across
    * a writer turn.
    */
  private val retainVersions = 8

  private[graft] val log = new GenerationLog[AdmissionManifest](
    storePath, AdmissionManifest.parse, _.serialize, _.files,
    retainVersions)

  private def hfs(spark: SparkSession) = log.hfs(spark)

  def resolve(spark: SparkSession): Option[AdmissionManifest] =
    log.resolve(spark)

  private def resolved(spark: SparkSession): AdmissionManifest =
    resolve(spark).getOrElse(throw new IllegalStateException(
      s"no admission manifest at $storePath — the store root has a " +
        "_commits directory but no parseable commit"))

  /** First-admission initialization: commit generation 0 declaring
    * the layout. Idempotent; a concurrent twin loses the CAS and
    * no-ops against the winner's declaration.
    */
  def initIfAbsent(spark: SparkSession, nBuckets: Int): AdmissionManifest = {
    resolve(spark) match {
      case Some(m) => requireLayout(m, nBuckets); m
      case None =>
        log.commitWithRetry(spark, None, _ => (), cleanupPerRace = true) {
          (_, manOpt) =>
            manOpt match {
              case Some(m) => requireLayout(m, nBuckets); None
              case None => Some((AdmissionManifest(nBuckets, 0, Map.empty,
                Nil, Map.empty), Nil))
            }
        }
        resolved(spark)
    }
  }

  private def requireLayout(m: AdmissionManifest, nBuckets: Int): Unit =
    require(m.nBuckets == nBuckets,
      s"admission store at $storePath is laid out over ${m.nBuckets} " +
        s"buckets but the caller passed nBuckets=$nBuckets — probing " +
        s"the wrong addresses silently under-suppresses; pass " +
        s"nBuckets=${m.nBuckets} (or migrate with rebucketAdmitted)")

  // ----------------------------- reads -----------------------------

  private def listStaged(spark: SparkSession, dir: String): Seq[String] = {
    val fs = hfs(spark)
    val p = log.sub(dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { s =>
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        Seq(s"$dir/${s.getPath.getName}")
      else if (s.isDirectory && s.getPath.getName.startsWith("adm_kb="))
        fs.listStatus(s.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => s"$dir/${s.getPath.getName}/${f.getPath.getName}")
      else Nil
    }
  }

  /** The staged bucket files of a partitioned staging dir, keyed by
    * bucket address (paths relative to the store root).
    */
  private def stagedByAddr(spark: SparkSession,
      dir: String): Map[Int, Seq[String]] =
    listStaged(spark, dir)
      .filter(_.split("/")(1).startsWith("adm_kb="))
      .groupBy(p => p.split("/")(1).stripPrefix("adm_kb=").toInt)

  /** Read a set of manifest bucket files as ONE relation carrying
    * `adm_kb`. Files are grouped by their generation directory (the
    * first path segment) and each group is read with its own
    * `basePath`, so `adm_kb` arrives as that group's inferred
    * partition column; groups union by name (schema drift across
    * generations tolerated, absent columns null = the fail-closed
    * legacy rule). Live generation-group count is bounded by the
    * fold/compact cadence exactly as live file counts are in the
    * listing layout.
    */
  private def readBucketFiles(spark: SparkSession,
      files: Seq[String]): Option[DataFrame] = {
    if (files.isEmpty) return None
    val groups = files.groupBy(_.split("/")(0))
    Some(groups.map { case (gen, fsOfGen) =>
      spark.read.option("basePath", log.subPath(gen))
        .option("mergeSchema", "true")
        .parquet(fsOfGen.map(log.subPath): _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  private def readTailFiles(spark: SparkSession,
      files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(files.map(log.subPath): _*))

  /** The probe relation a micro-batch joins: exactly the `touched`
    * addresses' manifest file lists plus the bounded tail — the
    * manifest lookup IS the partition pruning (no directory listing,
    * no existence probes), and the resolved generation's files are
    * immutable, so the read can never race a concurrent mutation.
    */
  def probeRel(spark: SparkSession, man: AdmissionManifest,
      keyCols: Seq[String], touched: Seq[Int],
      suppressSince: Long): Option[DataFrame] = {
    val bucketFiles = touched.flatMap(b => man.buckets.getOrElse(b, Nil))
    val rels = readBucketFiles(spark, bucketFiles).map(_.drop("adm_kb"))
      .toSeq ++ readTailFiles(spark, man.tail).map(_.drop("adm_kb")).toSeq
    rels.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(df => Dedup.inWindow(df, suppressSince)
        .select(col("doc_id").as("s_id") +:
          keyCols.map(c => col(c).as(s"s_$c")): _*))
  }

  // --------------------------- mutations ---------------------------

  /** Append one tail file of freshly admitted keys: stage the file in
    * a new `t-` directory, commit `tail ++ [file]`. The staged data
    * depends on nothing in the manifest, so a lost race keeps it and
    * simply re-commits against the winner (cleanupPerRace = false —
    * the codes stores' full-replacement rule).
    */
  def appendTail(spark: SparkSession, keys: DataFrame,
                 nBuckets: Int): Unit = {
    val dir = s"t-${log.uid}"
    keys.repartition(1).write.mode("overwrite").parquet(log.subPath(dir))
    val files = listStaged(spark, dir)
    if (files.isEmpty) { hfs(spark).delete(log.sub(dir), true); return }
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = false) { (_, manOpt) =>
      val man = manOpt.get
      requireLayout(man, nBuckets)
      Some((man.copy(tail = man.tail ++ files), files))
    }
  }

  /** Fold the tail into the bucket lists when it exceeds the file or
    * byte budget, then compact folded buckets over the file budget —
    * the listing layout's [[Dedup.foldAdmissionTail]] under manifest
    * commits. Everything derives inside the attempt, so a raced fold
    * re-reads the winner's tail. Returns the folded bucket addresses.
    */
  def foldAndCompact(spark: SparkSession, autoCompactFiles: Int,
      tailFoldFiles: Int, expireBefore: Long): Seq[Int] = {
    var folded: Seq[Int] = Nil
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = true) { (_, manOpt) =>
      val man = manOpt.get
      folded = Nil
      if (man.tail.isEmpty) None
      else {
        val fs = hfs(spark)
        val bytes = man.tail.map(f =>
          scala.util.Try(fs.getFileStatus(log.sub(f)).getLen)
            .getOrElse(0L)).sum
        if (man.tail.length <= tailFoldFiles &&
            bytes <= Dedup.admissionTailMaxBytes) None
        else {
          val raw = Dedup.inWindow(
            readTailFiles(spark, man.tail).get, expireBefore)
          // re-route through the CURRENT depth map (stored adm_kb was
          // routed at admission time and may predate splits since) —
          // same rule as the listing fold
          val splits = man.splits
          val routed =
            if (splits.depthByAddr.isEmpty) raw
            else {
              val keyCols = admissionKeyColumns(raw.columns.toSeq)
              raw.drop("adm_kb").withColumn("adm_kb",
                Dedup.routedAddr(xxhash64(keyCols.map(col): _*),
                  man.nBuckets, splits))
            }
          val dir = s"fold-${log.uid}"
          routed.repartition(col("adm_kb"))
            .write.mode("overwrite").partitionBy("adm_kb")
            .parquet(log.subPath(dir))
          val byAddr = stagedByAddr(spark, dir)
          folded = byAddr.keys.toSeq
          Some((man.copy(tail = Nil,
            buckets = byAddr.foldLeft(man.buckets) { case (bs, (a, fls)) =>
              bs.updated(a, bs.getOrElse(a, Nil) ++ fls)
            }), byAddr.values.flatten.toSeq))
        }
      }
    }
    if (folded.nonEmpty)
      compactBuckets(spark, folded, autoCompactFiles, expireBefore)
    folded
  }

  /** Rewrite any of `buckets` holding more than `maxFiles` files into
    * one deduplicated (newest-stamp) file each — one staged
    * partitioned write, one commit swapping the lists.
    */
  def compactBuckets(spark: SparkSession, buckets: Seq[Int],
      maxFiles: Int, expireBefore: Long): Seq[Int] = {
    var compacted: Seq[Int] = Nil
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = true) { (_, manOpt) =>
      val man = manOpt.get
      compacted = Nil
      val over = buckets.distinct
        .filter(b => man.buckets.getOrElse(b, Nil).length > maxFiles)
      if (over.isEmpty) None
      else {
        val cur = readBucketFiles(spark,
          over.flatMap(b => man.buckets(b))).get
        val live =
          if (expireBefore <= 0L) cur else Dedup.inWindow(cur, expireBefore)
        // collapse replayed appends keeping the NEWEST stamp (max
        // ignores nulls; all-legacy groups stay null = in-window
        // forever) — identical to the listing compactor
        val dedup =
          if (!live.columns.contains("adm_ts")) live.distinct()
          else live.groupBy(live.columns.filterNot(_ == "adm_ts")
              .map(col).toIndexedSeq: _*)
            .agg(max(col("adm_ts")).as("adm_ts"))
        val dir = s"cp-${log.uid}"
        dedup.repartition(col("adm_kb"))
          .write.mode("overwrite").partitionBy("adm_kb")
          .parquet(log.subPath(dir))
        val byAddr = stagedByAddr(spark, dir)
        compacted = over
        // a bucket whose rows ALL expired ends file-less: drop its key
        Some((man.copy(buckets = over.foldLeft(man.buckets) { (bs, a) =>
          byAddr.get(a) match {
            case Some(fls) => bs.updated(a, fls)
            case None => bs - a
          }
        }), byAddr.values.flatten.toSeq))
      }
    }
    compacted
  }

  /** Split ONE bucket into its power-of-two children — the online
    * growth step. One commit carries the rekeyed lists AND the depth
    * declaration atomically, so the listing layout's declare-depth-
    * before-moving ordering (and its decision-window race) has no
    * manifest-mode counterpart. Returns rows rewritten.
    */
  def splitBucket(spark: SparkSession, addr: Int): Long = {
    var moved = 0L
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = true) { (_, manOpt) =>
      val man = manOpt.get
      moved = 0L
      val files = man.buckets.getOrElse(addr, Nil)
      if (files.isEmpty) None
      else {
        val depth = man.depthByAddr.getOrElse(addr, 0)
        val newDepth = depth + 1
        require((man.nBuckets.toLong << newDepth) <= Int.MaxValue.toLong,
          s"splitAdmittedBucket: depth $newDepth over base " +
            s"${man.nBuckets} overflows the int bucket address space")
        val cur = readBucketFiles(spark, files).get
        val keyCols = admissionKeyColumns(cur.columns.toSeq)
        require(keyCols.nonEmpty,
          s"splitAdmittedBucket: no key columns under $storePath")
        val rekeyed = cur.drop("adm_kb").withColumn("adm_kb",
          pmod(xxhash64(keyCols.map(col): _*),
            lit(man.nBuckets.toLong << newDepth)).cast("int"))
        val obs = new org.apache.spark.sql.Observation(
          s"msplit-$addr-${log.uid}")
        val dir = s"split-${log.uid}"
        rekeyed.observe(obs, count(lit(1)).as("n"))
          .repartition(col("adm_kb"))
          .write.mode("overwrite").partitionBy("adm_kb")
          .parquet(log.subPath(dir))
        moved = obs.get("n").asInstanceOf[Long]
        val byAddr = stagedByAddr(spark, dir)
        Some((man.copy(
          maxDepth = math.max(man.maxDepth, newDepth),
          depthByAddr = man.depthByAddr - addr ++
            byAddr.keys.map(_ -> newDepth),
          buckets = (man.buckets - addr) ++ byAddr),
          byAddr.values.flatten.toSeq))
      }
    }
    moved
  }

  /** The shared store rewrite under removal/expiry/stamp: read the
    * target addresses' files (and the tail), stage `keepOf`'s output,
    * commit the swapped lists. `targetsOf` re-derives the touched
    * addresses from the CURRENT manifest on every attempt (the
    * serializable-commit twin of the listing drain's per-pass chain
    * re-expansion). Returns `hitsOf`'s row count.
    */
  def rewriteStore(spark: SparkSession,
      targetsOf: AdmissionManifest => Seq[Int],
      hitsOf: DataFrame => DataFrame,
      keepOf: DataFrame => DataFrame): Long = {
    var hits = 0L
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = true) { (_, manOpt) =>
      val man = manOpt.get
      hits = 0L
      val targets = targetsOf(man).distinct
        .filter(b => man.buckets.getOrElse(b, Nil).nonEmpty)
      val bucketRel = readBucketFiles(spark,
        targets.flatMap(b => man.buckets(b)))
      val tailRel = readTailFiles(spark, man.tail)
      // one detection job over both levels: per-bucket hit counts
      // (tail rows count under their stored adm_kb — only presence
      // matters for which lists to swap, and tail rows are always
      // rewritten with the tail)
      val bucketHits: Map[Int, Long] = bucketRel.map { rel =>
        hitsOf(rel).groupBy(col("adm_kb")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      }.getOrElse(Map.empty)
      val tailHits: Long =
        tailRel.map(rel => hitsOf(rel).count()).getOrElse(0L)
      hits = bucketHits.values.sum + tailHits
      if (hits == 0L) None
      else {
        var staged: Seq[String] = Nil
        var buckets2 = man.buckets
        if (bucketHits.nonEmpty) {
          val hitAddrs = bucketHits.keySet
          // the adm_kb filter partition-prunes each generation group
          // of the SAME detection relation down to the hit buckets'
          // files — no second listing, no re-read of no-hit buckets
          val keep = keepOf(bucketRel.get
            .filter(col("adm_kb").isInCollection(hitAddrs.toSeq)))
          val dir = s"rw-${log.uid}"
          keep.repartition(col("adm_kb"))
            .write.mode("overwrite").partitionBy("adm_kb")
            .parquet(log.subPath(dir))
          val byAddr = stagedByAddr(spark, dir)
          staged ++= byAddr.values.flatten
          buckets2 = hitAddrs.foldLeft(buckets2) { (bs, a) =>
            byAddr.get(a) match {
              case Some(fls) => bs.updated(a, fls)
              case None => bs - a
            }
          }
        }
        var tail2 = man.tail
        if (tailHits > 0L) {
          val dir = s"t-${log.uid}"
          keepOf(tailRel.get).repartition(1)
            .write.mode("overwrite").parquet(log.subPath(dir))
          val files = listStaged(spark, dir)
          staged ++= files
          tail2 = files
        }
        Some((man.copy(tail = tail2, buckets = buckets2), staged))
      }
    }
    hits
  }

  /** Transform-shaped rewrite (stamping): every target row is kept,
    * transformed — `hitsOf` still gates which lists rewrite.
    */
  def transformStore(spark: SparkSession,
      hitsOf: DataFrame => DataFrame,
      keepOf: DataFrame => DataFrame): Long =
    rewriteStore(spark, man => man.buckets.keys.toSeq, hitsOf, keepOf)

  /** Full layout migration to `newN` base buckets — one read of every
    * row, one staged partitioned write, ONE commit swapping the whole
    * layout (nBuckets, depth map reset, every list). Unlike the
    * listing layout's [[Dedup.rebucketAdmitted]] this is NOT
    * exclusive: concurrent probes keep their generation, and a raced
    * mutation simply re-derives against the migrated manifest.
    * Returns rows moved.
    */
  def rebucket(spark: SparkSession, newN: Int): Long = {
    require(newN > 0, s"newN must be positive: $newN")
    var moved = 0L
    log.commitWithRetry(spark, Some(noStore), beforeCommit,
      cleanupPerRace = true) { (_, manOpt) =>
      val man = manOpt.get
      moved = 0L
      val all = man.files
      if (all.isEmpty)
        Some((AdmissionManifest(newN, 0, Map.empty, Nil, Map.empty), Nil))
      else {
        // tail rows carry adm_kb as a DATA column — drop it everywhere
        // and re-key (same derivation as admission itself)
        val bucketRel = readBucketFiles(spark,
          man.buckets.values.flatten.toSeq).map(_.drop("adm_kb"))
        val tailRel = readTailFiles(spark, man.tail).map(_.drop("adm_kb"))
        val cur = (bucketRel.toSeq ++ tailRel.toSeq)
          .reduce(_.unionByName(_, allowMissingColumns = true))
        val keyCols = admissionKeyColumns(cur.columns.toSeq)
        require(keyCols.nonEmpty,
          s"rebucketAdmitted: no key columns under $storePath")
        val rekeyed = cur.withColumn("adm_kb",
          pmod(xxhash64(keyCols.map(col): _*), lit(newN)).cast("int"))
        val obs = new org.apache.spark.sql.Observation(s"mrb-${log.uid}")
        val dir = s"rb-${log.uid}"
        rekeyed.observe(obs, count(lit(1)).as("n"))
          .repartition(col("adm_kb"))
          .write.mode("overwrite").partitionBy("adm_kb")
          .parquet(log.subPath(dir))
        moved = obs.get("n").asInstanceOf[Long]
        val byAddr = stagedByAddr(spark, dir)
        Some((AdmissionManifest(newN, 0, Map.empty, Nil, byAddr),
          byAddr.values.flatten.toSeq))
      }
    }
    moved
  }

  /** Operational snapshot from the manifest — O(files) per-file
    * status calls for byte sizes (the listing layout's cost), zero
    * directory listings.
    */
  def stats(spark: SparkSession): Dedup.AdmissionStoreStats = {
    val man = resolved(spark)
    val fs = hfs(spark)
    def len(f: String): Long =
      scala.util.Try(fs.getFileStatus(log.sub(f)).getLen).getOrElse(0L)
    val perBucket = man.buckets.map { case (_, fls) =>
      (fls.length, fls.map(len).sum) }
    Dedup.AdmissionStoreStats(
      buckets = man.buckets.size,
      bucketFiles = perBucket.map(_._1.toLong).sum,
      bucketBytes = perBucket.map(_._2).sum,
      maxBucketFiles =
        if (perBucket.isEmpty) 0 else perBucket.map(_._1).max,
      tailFiles = man.tail.length,
      tailBytes = man.tail.map(len).sum,
      rebucketPending = false, // migrations commit atomically here
      declaredBuckets = Some(man.nBuckets),
      maxDepth = man.maxDepth,
      splitBuckets = man.depthByAddr.size)
  }

  /** Per-bucket (addr, files, bytes) — the maintenance policy's
    * signal, manifest-derived.
    */
  def bucketSizes(spark: SparkSession): Seq[(Int, Int, Long)] = {
    val man = resolved(spark)
    val fs = hfs(spark)
    man.buckets.toSeq.map { case (a, fls) =>
      (a, fls.length, fls.map(f =>
        scala.util.Try(fs.getFileStatus(log.sub(f)).getLen)
          .getOrElse(0L)).sum)
    }
  }

  /** Reclaim staged directories a crashed mutator orphaned: any
    * root-level directory under this store's staging prefixes, older
    * than the horizon, none of whose files any present commit
    * references. (The shared [[GenerationLog.vacuum]] matches
    * directory names against referenced entries, which are FILE paths
    * here — so the admission store carries its own sweep.)
    */
  def vacuum(spark: SparkSession, olderThanMs: Long = 3600000L)
      : Seq[String] = {
    val fs = hfs(spark)
    val root = new org.apache.hadoop.fs.Path(storePath)
    if (!fs.exists(root)) return Nil
    val referenced = log.commits(spark).flatMap(_._2.files)
      .map(_.split("/")(0)).toSet
    val horizon = System.currentTimeMillis() - olderThanMs
    val orphans = fs.listStatus(root).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && stagingPrefixes.exists(n.startsWith) &&
        !referenced.contains(n) && s.getModificationTime < horizon
    }
    orphans.foreach(s => fs.delete(s.getPath, true))
    orphans.map(_.getPath.getName)
  }

  private def noStore: String =
    s"no admission manifest at $storePath — admit a batch first"

  private def beforeCommit(version: Long): Unit =
    AdmissionManifestStore.beforeCommitFence(storePath, version)
}

private[graft] object AdmissionManifestStore {
  /** Staging-directory prefixes a mutation can orphan. */
  private val stagingPrefixes =
    Seq("t-", "fold-", "cp-", "split-", "rw-", "rb-")

  /** One store handle per path, reused across every entry-point
    * dispatch: the handle's [[GenerationLog]] carries the parsed-
    * commit cache (commit files are immutable, so a shared handle is
    * always coherent), and a per-call `new` would re-parse the whole
    * retained manifest history on every operation — the measured
    * scale term in the manifest-mode maintenance turn.
    */
  private val instances = scala.collection.concurrent.TrieMap
    .empty[String, AdmissionManifestStore]

  def apply(storePath: String): AdmissionManifestStore =
    instances.getOrElseUpdate(storePath,
      new AdmissionManifestStore(storePath))

  /** Mode detection: a store whose root carries a `_commits` log is a
    * manifest store; everything else is the listing layout.
    */
  def isManifestStore(fs: org.apache.hadoop.fs.FileSystem,
      storePath: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(storePath, "_commits"))

  /** Test seam: invoked after an attempt's staging is fully written,
    * immediately before its commit claim (the codes stores' seam) —
    * lets a spec fabricate lost CAS races. No-op in production.
    */
  @volatile private[graft] var beforeCommitFence
      : (String, Long) => Unit = (_, _) => ()
}

/** One committed generation of a manifest-mode admission store: the
  * layout declaration plus every logical location's live file list
  * (paths relative to the store root; bucket files always shaped
  * `<generation-dir>/adm_kb=<addr>/<file>` so group reads can infer
  * the partition column, tail files `<t-dir>/<file>`).
  */
private[graft] final case class AdmissionManifest(
    nBuckets: Int,
    maxDepth: Int,
    depthByAddr: Map[Int, Int],
    tail: Seq[String],
    buckets: Map[Int, Seq[String]]) {

  def splits: Dedup.AdmissionSplits =
    Dedup.AdmissionSplits(maxDepth, depthByAddr)

  def files: Seq[String] = tail ++ buckets.values.flatten

  def serialize: String = {
    val b = new StringBuilder
    b.append(s"nbuckets $nBuckets\n")
    b.append(s"maxdepth $maxDepth\n")
    depthByAddr.toSeq.sorted.foreach { case (a, d) =>
      b.append(s"depth $a $d\n") }
    tail.foreach(f => b.append(s"tail $f\n"))
    buckets.toSeq.sortBy(_._1).foreach { case (a, fls) =>
      fls.foreach(f => b.append(s"bucket $a $f\n")) }
    b.result()
  }
}

private[graft] object AdmissionManifest {
  def parse(content: String): Option[AdmissionManifest] = scala.util.Try {
    var nBuckets = -1
    var maxDepth = 0
    val depths = Map.newBuilder[Int, Int]
    val tail = Seq.newBuilder[String]
    val buckets = scala.collection.mutable.Map.empty[Int, Vector[String]]
    content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
      val parts = line.trim.split("\\s+")
      parts(0) match {
        case "nbuckets" => nBuckets = parts(1).toInt
        case "maxdepth" => maxDepth = parts(1).toInt
        case "depth" => depths += (parts(1).toInt -> parts(2).toInt)
        case "tail" => tail += parts(1)
        case "bucket" =>
          val a = parts(1).toInt
          buckets(a) = buckets.getOrElse(a, Vector.empty) :+ parts(2)
        case other => throw new IllegalArgumentException(
          s"unknown admission-manifest keyword: $other")
      }
    }
    require(nBuckets > 0, "manifest missing nbuckets")
    // the listing layout's _splits read-bounds, applied to the folded-
    // in declaration: a damaged manifest must fail loudly, not
    // mis-route probe chains
    require(maxDepth >= 0 && maxDepth <= 30 &&
      (nBuckets.toLong << maxDepth) <= Int.MaxValue.toLong,
      s"manifest maxdepth $maxDepth out of range for base $nBuckets")
    val dm = depths.result()
    require(dm.forall { case (a, d) => a >= 0 && d >= 0 && d <= maxDepth },
      "manifest depth entries out of range")
    AdmissionManifest(nBuckets, maxDepth, dm, tail.result(),
      buckets.view.mapValues(_.toSeq).toMap)
  }.toOption
}
