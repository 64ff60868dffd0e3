package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Hashing, IvfIndex, Similarity, Text}
import graft.sources.CorpusGenerator

/** Empirical scaling proof for the dedup/ANN operator family: run the
  * four headline operators at a corpus size and at 10× that size, and
  * report the scaling exponent e = log(t₁₀ₓ/t₁ₓ)/log(10) of each —
  * e ≈ 1 is linear (the design claim), e ≈ 2 would mean a quadratic
  * blowup survived the bucketing/capping defenses.
  *
  * Tuning knobs follow each operator's own scaling doc: LSH planes
  * grow with log₂(n) to hold bucket occupancy constant, IVF cells grow
  * with √n — scaling the KNOBS with the data is part of the claim
  * being proven (a fixed 16-bucket table is linear in n² at 100×).
  *
  * Usage: `runMain graft.ScaleProof [small] [factor]`
  * (defaults 5000, 10 → runs at 5k and 50k docs/vectors).
  * Prints one JSON line per (operator, size) plus a summary line with
  * the exponents; results are recorded in PLANS.md §scaling.
  */
object ScaleProof {

  private val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt

  /** (min, per-rep times, rows). The per-rep sequence is part of the
    * record: for ops with a durable build-once artifact (the bigram
    * model store, the IVF index) rep 1 carries the build and the
    * later reps measure the amortized steady state — the min alone
    * would hide that the drop happened.
    */
  private def timeReps(f: () => Long): (Double, Seq[Double], Long) = {
    var rows = 0L
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows = f()
      (System.nanoTime() - t0) / 1e9
    }
    (times.min, times, rows)
  }

  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0).toLong else 5000L
    val factor = if (args.length > 1) args(1).toInt else 10
    val big = small * factor
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // NOTE: heap must come from the launching JVM (SBT_OPTS=-Xmx…) —
    // in local mode spark.driver.memory set here, after JVM start,
    // is a silent no-op
    val work = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed standing tables are managed tables — point the
      // warehouse at the run's temp dir so scale artifacts never land
      // in (and never collide with) the repo's warehouse
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_MODEL_BCAST_MAX=0 forces the shuffle_hash regime of
    // the size-gated model joins (ModelJoin) — the at-100 TB
    // configuration, provable here without a 100 TB vocabulary
    sys.env.get("SPARK_GRAFT_MODEL_BCAST_MAX").foreach(v =>
      spark.conf.set(graft.functions.ModelJoin.broadcastMaxRowsKey, v))

    // materialize each corpus once (operators read parquet, so timing
    // measures the operators, not generation)
    def corpus(n: Long): (DataFrame, DataFrame) = {
      val dDir = s"$work/docs_$n"; val eDir = s"$work/emb_$n"
      CorpusGenerator.documents(spark, n).write.mode("overwrite").parquet(dDir)
      CorpusGenerator.embeddings(spark, n).write.mode("overwrite").parquet(eDir)
      (spark.read.parquet(dDir), spark.read.parquet(eDir))
    }

    def planesFor(n: Long): Int = // hold ~100 vectors/bucket
      math.max(4, (math.log(n / 100.0) / math.log(2)).round.toInt)
    def cellsFor(n: Long): Int = math.max(16, math.sqrt(n).round.toInt)
    // admission-store layout: ~100 docs/bucket, so a fixed batch's
    // touched-bucket read stays batch-proportional as the store grows
    // (the nBuckets-scales-with-corpus discipline, like cellsFor)
    def admitBucketsFor(n: Long): Int = math.max(16, (n / 100).toInt)

    // seeded admitted-keys store per corpus size (setup, untimed):
    // the whole corpus admitted in 4 sequential micro-batches
    val admitSeeded = scala.collection.mutable.Set.empty[Long]
    def admitSetup(n: Long, docs: DataFrame): String = {
      val store = s"$work/admsteady_$n"
      if (!admitSeeded(n)) {
        for (b <- 0 until 4)
          Dedup.nearDupFilterBatch(
            docs.filter(pmod(col("doc_id"), lit(4L)) === b),
            store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16)
        admitSeeded += n
      }
      store
    }
    // the split leg's own store, seeded FULLY FOLDED into L1 buckets
    // (tailFoldFiles = 0): admitSetup's store can sit entirely in the
    // L0 tail at small n (4 appends under the fold budget), where a
    // bucket split has nothing to move and the leg would time nothing
    val admitSplitSeeded = scala.collection.mutable.Set.empty[Long]
    def admitSplitSetup(n: Long, docs: DataFrame): String = {
      val store = s"$work/admsplit_$n"
      if (!admitSplitSeeded(n)) {
        for (b <- 0 until 4)
          Dedup.nearDupFilterBatch(
            docs.filter(pmod(col("doc_id"), lit(4L)) === b),
            store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16,
            tailFoldFiles = 0)
        admitSplitSeeded += n
      }
      store
    }
    // manifest-mode twin of admitSetup (the publish-mode A/B)
    val admitMfSeeded = scala.collection.mutable.Set.empty[Long]
    def admitManifestSetup(n: Long, docs: DataFrame): String = {
      val store = s"$work/admmanifest_$n"
      if (!admitMfSeeded(n)) {
        for (b <- 0 until 4)
          Dedup.nearDupFilterBatch(
            docs.filter(pmod(col("doc_id"), lit(4L)) === b),
            store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16,
            manifestStore = true)
        admitMfSeeded += n
      }
      store
    }
    val admitRep = new java.util.concurrent.atomic.AtomicLong(0)
    val admitMaintRep = new java.util.concurrent.atomic.AtomicLong(0)
    val admitMaintMfRep = new java.util.concurrent.atomic.AtomicLong(0)
    val admitSplitRep = new java.util.concurrent.atomic.AtomicLong(0)
    val admitSplitDirs =
      scala.collection.mutable.Map.empty[Long, Array[Int]]
    // removal-ONLY manifest leg: deterministic 8-doc batches, admitted
    // UNTIMED at setup so each timed rep pays exactly one takedown
    def admitRemovalBatch(r: Int): DataFrame = CorpusGenerator
      .documents(spark, 8, seed = 9900 + r)
      .select((col("doc_id") + lit(40000000L + r * 1000L)).as("doc_id"),
        col("text"))
    // own store, seeded FULLY FOLDED (tailFoldFiles = 0, the
    // admitSplitSetup rule): admitManifestSetup's store sits entirely
    // in the L0 tail at small n, so a takedown there rewrites one tail
    // file while the big store's takedown walks the bucket path — the
    // exponent would compare shapes, not scales
    val admitRemoveSeeded = scala.collection.mutable.Set.empty[Long]
    def admitRemoveSetup(n: Long, docs: DataFrame): String = {
      val store = s"$work/admremove_$n"
      if (!admitRemoveSeeded(n)) {
        for (b <- 0 until 4)
          Dedup.nearDupFilterBatch(
            docs.filter(pmod(col("doc_id"), lit(4L)) === b),
            store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16,
            tailFoldFiles = 0, manifestStore = true)
        for (r <- 0 to reps + 1)
          Dedup.nearDupFilterBatch(admitRemovalBatch(r), store,
            "doc_id", "text", nBuckets = admitBucketsFor(n),
            autoCompactFiles = 16, tailFoldFiles = 0).count()
        admitRemoveSeeded += n
      }
      store
    }
    val admitRemoveRep = scala.collection.mutable.Map.empty[Long, Int]

    // (view0 checkpointed, feed checkpointed, sink) per corpus size —
    // built once on first use so the timed IVM reps never pay setup.
    // The maintained view is the token budget per source —
    // sum(|tokens(text)|) — because that is where the refresh
    // asymmetry lives: a NARROW column sum recomputes in job-overhead
    // time under vectorized parquet scans at any size measurable on
    // one box (verified: flat 0.2-0.3 s at both 50k and 5M), while a
    // tokenize-derived sum makes recompute pay the corpus tokenize
    // and advance only the delta's.
    val ivmTokens = (df: DataFrame) => df.withColumn("n_toks",
      size(graft.functions.Text.tokens(col("text"))).cast("long"))
    val ivmCache = scala.collection.mutable.Map.empty[
      Long, (DataFrame, DataFrame, graft.operators.ParquetUpsertSink)]
    def ivmSetup(n: Long, docs: DataFrame)
        : (DataFrame, DataFrame, graft.operators.ParquetUpsertSink) =
      ivmCache.getOrElseUpdate(n, {
        val dir = s"$work/ivm_$n"
        val sink = new graft.operators.ParquetUpsertSink(
          dir, Seq("doc_id"), retainVersions = 4)
        sink.upsert(spark, docs.select("doc_id", "source", "text"),
          batchId = 0)
        val v0 = sink.currentVersion(spark)
        val view0 = graft.operators.IncrementalAgg.view(
          ivmTokens(sink.readVersion(spark, v0)), Seq("source"),
          Seq("n_toks")).localCheckpoint(true)
        sink.upsert(spark,
          docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
            .select(col("doc_id"), col("source"),
              concat(col("text"), lit(" appended")).as("text")),
          batchId = 1)
        sink.delete(spark, pmod(col("doc_id"), lit(1000L)) === 7, batchId = 2)
        val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
          withPreimages = true).localCheckpoint(true)
        (view0, feed, sink)
      })

    // pre-feed COUNT(DISTINCT) multiplicity state (built once per n,
    // off the ivm sink's retained v0 — the timed reps advance it)
    val distinctCache = scala.collection.mutable.Map.empty[Long, DataFrame]
    def distinctSetup(n: Long, docs: DataFrame): DataFrame =
      distinctCache.getOrElseUpdate(n, {
        val (_, _, sink) = ivmSetup(n, docs)
        graft.operators.IncrementalAgg.distinctState(
          ivmTokens(sink.readVersion(spark, 0)), Seq("source"), "n_toks")
          .localCheckpoint(true)
      })

    // Z-order-compacted versioned table per corpus size for the
    // data-skipping legs — built once outside the timers (the build is
    // `upsert_changes_between`'s + compaction's own cost). FIXED
    // 256 KB target files so the FILE COUNT grows with n, exactly as
    // a real table's does: the pruning claim is about file count.
    val skipCache = scala.collection.mutable.Map.empty[
      Long, graft.operators.ParquetUpsertSink]
    def skipSetup(n: Long, docs: DataFrame)
        : graft.operators.ParquetUpsertSink =
      skipCache.getOrElseUpdate(n, {
        val dir = s"$work/skip_$n"
        val sink = new graft.operators.ParquetUpsertSink(dir, Seq("doc_id"))
        sink.upsert(spark, docs.select("doc_id", "source", "n_chars"),
          batchId = -1)
        sink.compact(spark, targetFileBytes = 256L * 1024,
          clusterBy = Seq("doc_id", "n_chars"), zorder = true)
        // the at-scale figure of merit: files the manifest ELIMINATES
        // for the benchmark predicate (each is a task + open + footer
        // fetch that never happens on a cluster)
        val (kept, total) = sink.scanFileCounts(spark,
          col("doc_id").between(0L, 999L) && col("n_chars") > 200L)
        println(s"""{"op":"scan_pruned_files","n":$n,""" +
          s""""kept":$kept,"total":$total}""")
        sink
      })

    // Bloom-indexed table clustered on n_chars ONLY, so doc_id point
    // lookups are prunable exclusively through the per-file blooms —
    // the high-cardinality-key shape min/max can never serve. Printed
    // kept/total is the at-scale figure of merit: total grows with n
    // (fixed 256 KB files), kept stays ~1 + fpp·total.
    val bloomCache = scala.collection.mutable.Map.empty[
      Long, graft.operators.ParquetUpsertSink]
    def bloomSetup(n: Long, docs: DataFrame)
        : graft.operators.ParquetUpsertSink =
      bloomCache.getOrElseUpdate(n, {
        val dir = s"$work/bloom_$n"
        val sink = new graft.operators.ParquetUpsertSink(dir, Seq("doc_id"),
          bloomCols = Seq("doc_id"))
        sink.upsert(spark, docs.select("doc_id", "source", "n_chars"),
          batchId = -1)
        sink.compact(spark, targetFileBytes = 256L * 1024,
          clusterBy = Seq("n_chars"))
        val (kept, total) = sink.scanFileCounts(spark,
          col("doc_id") === lit(n / 2))
        println(s"""{"op":"bloom_pruned_files","n":$n,""" +
          s""""kept":$kept,"total":$total}""")
        // DFP file decision for a SELECTIVE build side (4 neighboring
        // keys — the shape a filtered dim produces; 16 keys spread
        // uniformly over 12 files would legitimately admit every
        // window) on BOTH layouts: against the key-clustered table
        // the sorted-key windows prune directly (the star-join
        // configuration); against THIS adversarial layout only the
        // blooms refine
        val dfpKeys: Array[Any] =
          Seq(0L, 3L, 7L, 11L).map(i => (n / 2 + i): Any).toArray
        val snap = sink.history(spark).first().getString(4)
        val (jKept, jTotal) = sink.scanForJoinSelection(spark, snap,
          "doc_id", dfpKeys, lit(true))
        println(s"""{"op":"dfp_bloom_files","n":$n,""" +
          s""""kept":${jKept.size},"total":$jTotal}""")
        val clustered = skipSetup(n, docs)
        val cSnap = clustered.history(spark).first().getString(4)
        val (cKept, cTotal) = clustered.scanForJoinSelection(spark, cSnap,
          "doc_id", dfpKeys, lit(true))
        println(s"""{"op":"dfp_clustered_files","n":$n,""" +
          s""""kept":${cKept.size},"total":$cTotal}""")
        sink
      })

    // Partitioned history table per corpus size for the delta-CDC
    // leg: with retainHistory the feed between adjacent versions is
    // built from the actions files' add/remove lists and reads ONLY
    // the touched directories' old+new files — so a FIXED-SIZE commit
    // (one directory of 32) must cost ~the same at n and 10n.
    // Contrast `upsert_changes_between`, the versioned snapshot-diff
    // whose cost follows table size.
    // Restore copy-back: a history table whose delete froze HALF the
    // partition directories (a FIXED 512-file delta — file count, not
    // bytes, is what a one-box page cache lets this leg measure);
    // restore() must copy that half back. The copies run as a Spark
    // job (graft.upsert.restoreCopySlices tunes the task count), so
    // the serial-vs-parallel pair below is the wall-clock
    // demonstration that the byte path is executor-parallel — the
    // measured gap IS the serialized per-file cost the old driver
    // pool shape would pay on every file — while the ~0 exponent
    // across a 10× table shows restore cost follows the restored
    // delta, never the table. The restore_delta line records the
    // moved file/byte volume behind each number.
    val restoreCache = scala.collection.mutable.Map.empty[
      Long, (graft.operators.ParquetUpsertSink, Long, Long)]
    def restoreSetup(n: Long, docs: DataFrame)
        : (graft.operators.ParquetUpsertSink, Long, Long) =
      restoreCache.getOrElseUpdate(n, {
        val dir = s"$work/restore_$n"
        // retainVersions sized FROM THE REP COUNT so every ping-pong
        // restore below keeps v0/v1 reconstructible: each roundtrip
        // commits 2 versions and BOTH parallelism legs run `reps`
        // roundtrips, so a fixed 64 overflowed the window (GC'ing
        // v0/v1 mid-bench) whenever SPARK_GRAFT_SCALE_REPS >= ~16
        val sink = new graft.operators.ParquetUpsertSink(dir,
          Seq("doc_id"), partitionCol = Some("pt"),
          retainVersions = 4 * reps + 16, retainHistory = true)
        // keep the text column: the leg measures BYTE movement, and a
        // narrow 3-column table would make every copy a page-cache
        // blink whatever the parallelism
        val base = docs.select(col("doc_id"), col("text"), col("source"))
          .withColumn("pt", pmod(col("doc_id"), lit(64L)))
        sink.upsert(spark, base, batchId = 0)
        val vFull = sink.currentVersion(spark)
        sink.delete(spark, col("pt") < 32L, batchId = 1)
        val vHalf = sink.currentVersion(spark)
        val fsys = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val frozen = graft.operators.PartitionedHistory
          .historyDir(new org.apache.hadoop.fs.Path(dir), vHalf)
        val sum = fsys.getContentSummary(frozen)
        println(s"""{"metric":"restore_delta","n":$n,""" +
          s""""files":${sum.getFileCount},"bytes":${sum.getLength}}""")
        (sink, vFull, vHalf)
      })
    // one timed unit = copy-back restore (to vFull) + rename-only
    // reset restore (to vHalf); the reset is metadata-only and common
    // to both parallelism variants, so the variant DELTA is pure copy
    def restoreRoundtrip(n: Long, docs: DataFrame): Long = {
      val (sink, vFull, vHalf) = restoreSetup(n, docs)
      sink.restore(spark, vFull)
      sink.restore(spark, vHalf)
      graft.operators.PartitionedHistory.liveRelpaths(
        new org.apache.hadoop.fs.Path(s"$work/restore_$n")
          .getFileSystem(spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(s"$work/restore_$n"), "pt").size.toLong
    }
    val partFeedCache = scala.collection.mutable.Map.empty[
      Long, graft.operators.ParquetUpsertSink]
    def partFeedSetup(n: Long, docs: DataFrame)
        : graft.operators.ParquetUpsertSink =
      partFeedCache.getOrElseUpdate(n, {
        val dir = s"$work/pfeed_$n"
        val sink = new graft.operators.ParquetUpsertSink(dir,
          Seq("doc_id"), partitionCol = Some("pt"), retainVersions = 4,
          retainHistory = true)
        val base = docs.select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("pt", pmod(col("doc_id"), lit(32L)))
        sink.upsert(spark, base, batchId = 0)
        // fixed-size commit: ~n/32 capped to doc_id < 512 → ≤16 rows,
        // exactly ONE touched directory whatever n is
        sink.upsert(spark,
          base.filter(col("pt") === 0L && col("doc_id") < 512L)
            .withColumn("n_chars", col("n_chars") + 1L),
          batchId = 1)
        sink
      })

    // write-once IVF-PQ artifacts per corpus size (codebook, cached
    // coarse quantizer, cell-partitioned encoded codes) — built on
    // first use inside the timed thunk (rep 1 carries the build, the
    // convention every durable-artifact leg follows). The codes table
    // comes from a PqCodesStore fed by build(low half) + append(high
    // half): the steady-state probe under measurement reads an
    // APPENDED two-segment generation — the 100 TB maintenance shape
    // (corpus growth = encode only the delta against the frozen
    // codebook) is what the exponent is measured on.
    val pqIdxCache = scala.collection.mutable.Map.empty[Long,
      (Similarity.PqCodebook, (DataFrame, DataFrame), DataFrame)]
    def pqIdxSetup(n: Long, emb: DataFrame)
        : (Similarity.PqCodebook, (DataFrame, DataFrame), DataFrame) =
      pqIdxCache.getOrElseUpdate(n, {
        val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16)
        val nc = math.max(16, math.sqrt(n.toDouble).round.toInt)
        val quant = Similarity.ivfQuantizeCached(emb, nc)
        val store = new graft.functions.PqCodesStore(
          s"$work/pqstore_$n", m = 8, nCodes = 16, nCells = Some(nc))
        store.build(emb.filter(col("vec_id") < n / 2), Some(cb))
        store.append(emb.filter(col("vec_id") >= n / 2))
        (cb, quant, store.codes(spark))
      })

    def ops(n: Long, docs: DataFrame, emb: DataFrame): Seq[(String, () => Long)] = {
      val queries = emb.filter(col("vec_id") < 64)
      Seq(
        "dedup_minhash_pairs" -> (() =>
          Dedup.lshCandidatePairs(
            Dedup.lshBands(Dedup.minhashSignatures(
              Dedup.docShingleHashes(docs, "doc_id", "text", 3), 16), 16, 4),
            maxBucketSize = 1000).count()),
        // table-backed inverted index, NOT localCheckpoint: at 500k
        // docs the checkpointed shingle relation (~60M rows) no longer
        // fits a single JVM's storage memory — the durable-index path
        // is the at-scale configuration being proven
        "dedup_jaccard_pairs" -> (() =>
          Dedup.jaccardPairs(
            Dedup.docShingleHashes(docs, "doc_id", "text", 3), 0.8,
            maxShingleDf = 128,
            indexPath = Some(s"$work/jix_$n")).count()),
        // connected components over the verified pair list (planted
        // ~2% exact + ~3% near dups → thousands of small clusters).
        // The edge list is pre-materialized (see the per-n loop), so
        // this times the star-contraction fixpoint loop itself; the
        // scale story is that CC runs on the PAIR list, which the
        // capped candidate generation already keeps orders of
        // magnitude smaller than the corpus
        // driverThreshold 0: the claim under proof is the DISTRIBUTED
        // star-contraction loop (production defaults would route these
        // pair-list sizes to the driver union-find fast path)
        "dedup_clusters" -> (() =>
          Dedup.connectedComponents(
            spark.read.parquet(s"$work/pairs_$n"),
            driverThreshold = 0L).count()),
        // real-corpus pair lists stay tiny (that is the point of
        // capped candidate generation), so the row above mostly
        // measures fixed overhead. This op feeds the loop n SYNTHETIC
        // edges over n/2 nodes — supercritical Erdős–Rényi, where a
        // giant component of diameter ~log n emerges: the regime that
        // actually stresses the contraction rounds
        "cc_synthetic_edges" -> (() =>
          Dedup.connectedComponents(
            spark.range(n).select(
              pmod(xxhash64(col("id")), lit(n / 2)).as("doc_a"),
              pmod(xxhash64(col("id"), lit(1L)), lit(n / 2)).as("doc_b")),
            driverThreshold = 0L).count()),
        // ingest-shape dedup: the corpus arrives as 5 sequential
        // micro-batches against a GROWING persisted band-key store —
        // measures the store equi-join path, which is what runs
        // forever at 100 TB ingest (fresh store per rep)
        "neardup_ingest" -> (() => {
          val store = s"$work/ndstore_$n"
          val hfs = org.apache.hadoop.fs.FileSystem
            .get(spark.sparkContext.hadoopConfiguration)
          hfs.delete(new org.apache.hadoop.fs.Path(store), true)
          val batches = 5
          var survivors = 0L
          for (b <- 0 until batches) {
            val batch = docs.filter(pmod(col("doc_id"), lit(batches)) === b)
            survivors += Dedup.nearDupFilterBatch(
              batch, store, "doc_id", "text").count()
          }
          survivors
        }),
        // STEADY-STATE admission: a FIXED 8-doc batch against the
        // n-doc seeded store — the per-arrival cost a 100 TB ingest
        // pays forever. The store is bucketed at ~100 docs/bucket
        // (layout scales with corpus), so the batch's ~32 band keys
        // touch a bounded bucket set and the store join reads a
        // batch-proportional slice whatever the store size: expect a
        // near-flat exponent (the pre-partitioned layout re-scanned
        // the FULL store per batch — exponent ≈ 1 by construction)
        "admit_steady" -> (() => {
          val store = admitSetup(n, docs)
          val r = admitRep.incrementAndGet()
          val batch = CorpusGenerator
            .documents(spark, 8, seed = 7000 + r)
            .select((col("doc_id") + lit(10000000L + r * 1000L))
              .as("doc_id"), col("text"))
          Dedup.nearDupFilterBatch(batch, store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16).count()
        }),
        // steady-state MAINTENANCE against the same n-doc store: one
        // WINDOWED fixed-8-doc admission (suppressSince active on
        // every stored row — the endless-ingest retention regime)
        // followed by a content-keyed TAKEDOWN of that same batch.
        // Admission reads the pruned slice under the window filter;
        // the takedown re-derives the batch's keys and rewrites only
        // its touched bucket directories — both O(batch), so expect a
        // near-flat exponent like admit_steady's (a full-sweep
        // removal here would be exponent ≈ 1 by construction). The
        // removal also returns the store to its pre-rep key set, so
        // reps don't grow state.
        "admit_maint" -> (() => {
          val store = admitSetup(n, docs)
          val r = admitMaintRep.incrementAndGet()
          val batch = CorpusGenerator
            .documents(spark, 8, seed = 9000 + r)
            .select((col("doc_id") + lit(20000000L + r * 1000L))
              .as("doc_id"), col("text"))
          val now = System.currentTimeMillis()
          Dedup.nearDupFilterBatch(batch, store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16,
            admittedAt = now,
            suppressSince = now - 24L * 3600 * 1000).count()
          Dedup.nearDupRemove(batch, store, "doc_id", "text",
            nBuckets = admitBucketsFor(n))
        }),
        // the SAME windowed-admit + takedown turn against a MANIFEST
        // store — prices the commit-log publish mode's per-turn
        // overhead (CAS commits, manifest parse/serialize, staged
        // dirs) against admit_maint's listing layout at both scales.
        // Manifest size grows with the store's file count, so this
        // leg also watches that the O(1)-publish claim is not hiding
        // an O(manifest) parse term: expect admit_maint's near-flat
        // exponent plus a constant.
        "admit_maint_manifest" -> (() => {
          val store = admitManifestSetup(n, docs)
          val r = admitMaintMfRep.incrementAndGet()
          val batch = CorpusGenerator
            .documents(spark, 8, seed = 9500 + r)
            .select((col("doc_id") + lit(30000000L + r * 1000L))
              .as("doc_id"), col("text"))
          val now = System.currentTimeMillis()
          Dedup.nearDupFilterBatch(batch, store, "doc_id", "text",
            nBuckets = admitBucketsFor(n), autoCompactFiles = 16,
            admittedAt = now,
            suppressSince = now - 24L * 3600 * 1000).count()
          Dedup.nearDupRemove(batch, store, "doc_id", "text",
            nBuckets = admitBucketsFor(n))
        }),
        // the TAKEDOWN alone against the manifest store — the removal
        // cost curve the combined admit_maint_manifest turn folds into
        // its admission: batches were admitted at setup (untimed), so
        // each rep is exactly one content-keyed takedown — re-derive
        // the batch's keys, read its touched chains through their
        // group manifests, one serializable commit (no drain). Both
        // the detection read and the group rewrites are O(batch
        // chains), so expect a near-flat exponent like admit_maint's;
        // this is the GDPR-latency number an operator actually quotes.
        "admit_remove_manifest" -> (() => {
          val store = admitRemoveSetup(n, docs)
          val r = admitRemoveRep.updateWith(n)(
            c => Some(c.getOrElse(-1) + 1)).get
          val removed = Dedup.nearDupRemove(admitRemovalBatch(r), store,
            "doc_id", "text", nBuckets = admitBucketsFor(n))
          require(removed > 0L,
            s"admit_remove_manifest is vacuous at n=$n rep $r")
          removed
        }),
        // the MIGRATION's own cost curve — the honest O(store)
        // baseline the O(batch) admit legs contrast against: each rep
        // re-buckets the whole seeded store to twice its modulus and
        // back (two full migrations, ending at the original layout so
        // the other admit legs see it unchanged). The batched
        // implementation is a constant FOUR jobs however many bucket
        // directories exist; expect exponent ≈ 1 (data-linear — every
        // key row moves twice), NOT super-linear (a per-directory job
        // loop would add an O(modulus) scheduling term on top).
        "admit_rebucket" -> (() => {
          val store = admitSetup(n, docs)
          val nb = admitBucketsFor(n)
          Dedup.rebucketAdmitted(spark, store, nb * 2) +
            Dedup.rebucketAdmitted(spark, store, nb)
        }),
        // the INCREMENTAL growth step — the online alternative whose
        // whole point is contrast with admit_rebucket's O(store): one
        // extendible-hashing bucket split per rep (a fresh base bucket
        // each rep, so reps never re-split an already-thinned child).
        // The layout holds ~100 docs/bucket at EVERY n
        // (admitBucketsFor scales the modulus with the corpus), so
        // the split reads and republishes one near-constant bucket's
        // data however big the store — expect a near-flat exponent
        // where the full migration is data-linear. This is the growth
        // cost an ingest actually pays per maintenance turn, with no
        // exclusivity window at all. (The policy pass that CHOOSES
        // the bucket is a driver-side O(buckets) listing, priced
        // separately in its Scaladoc; the split is the data mover.)
        "admit_split" -> (() => {
          val store = admitSplitSetup(n, docs)
          val r = admitSplitRep.incrementAndGet()
          // pick the target from a FRESH listing of existing bucket
          // directories (arithmetic over the modulus could land on a
          // bucket an earlier split emptied into its sibling — whose
          // directory is then gone — and abort the whole bench run on
          // the moved>0 non-vacuity gate at small per-bucket counts).
          // ONE root listing per (store, n) — cached across reps (a
          // stale entry for a later-emptied dir is absorbed by the
          // walk-forward probe); non-emptiness is probed walking
          // forward from the rep's deterministic start (almost always
          // the first candidate), never a per-bucket listing sweep —
          // the selection must stay O(1)-ish or it, not the split, is
          // what the exponent measures.
          val fs = new org.apache.hadoop.fs.Path(store)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val dirs = admitSplitDirs.getOrElseUpdate(n,
            fs.listStatus(new org.apache.hadoop.fs.Path(store))
              .filter(s => s.isDirectory &&
                s.getPath.getName.startsWith("adm_kb="))
              .map(_.getPath.getName.stripPrefix("adm_kb=").toInt)
              .sorted)
          require(dirs.nonEmpty, s"admit_split has no bucket at n=$n")
          val start = ((r * 31L) % dirs.length).toInt
          val addr = (0 until dirs.length).iterator
            .map(i => dirs((start + i) % dirs.length))
            .find { a =>
              scala.util.Try(fs.listStatus(new org.apache.hadoop.fs.Path(
                  store, s"adm_kb=$a"))).getOrElse(Array.empty)
                .exists(f => f.isFile &&
                  f.getPath.getName.endsWith(".parquet"))
            }
            .getOrElse(sys.error(
              s"admit_split has no non-empty bucket at n=$n"))
          val moved = Dedup.splitAdmittedBucket(spark, store, addr)
          require(moved > 0L,
            s"admit_split is vacuous: bucket $addr at n=$n was empty")
          moved
        }),
        // suffix-array-style substring dedup signal: positional-index
        // parquet materialization (the durable path, like jaccard's
        // inverted index), distinct-doc counting, and the per-doc
        // gaps-and-islands window. The window partitions by doc_id —
        // bounded per-doc state, so corpus growth adds partitions,
        // not partition size
        "docs_dup_span_fraction" -> (() =>
          Dedup.dupSpanFraction(docs, "doc_id", "text", 8,
            indexPath = Some(s"$work/psix_$n")).count()),
        // corpus-model text family: both ops build a broadcastable
        // model over the whole corpus (document frequencies / bigram
        // counts) then score every document against it — the shape
        // whose scale risk is MODEL size, not corpus size. The
        // generator's ~800-word vocabulary bounds both models the way
        // a top-V vocabulary cap does in production.
        "docs_tfidf_topk" -> (() => {
          val words = docs.select(col("doc_id"),
            explode(Text.tokens(col("text"))).as("word"))
          val tf = words.groupBy(col("doc_id"), col("word"))
            .agg(count(lit(1)).as("tf"))
          // same size-gated model join as the query surface (a
          // hardcoded broadcast churned a full-vocabulary broadcast
          // per rep — the measured 21→43 s rep drift at 500k — and
          // ignored the MODEL_BCAST_MAX=0 at-scale regime)
          val dfreq = words.groupBy(col("word"))
            .agg(countDistinct(col("doc_id")).as("df"))
            .localCheckpoint(true)
          val scored = graft.functions.ModelJoin.sizeGated(
              tf, dfreq, Seq("word"))
            .select(col("doc_id"), col("word"),
              Hashing.portableRound(col("tf").cast("double")
                * log(lit(n.toDouble) / col("df").cast("double")), 6)
                .as("tfidf"))
          graft.plans.TopKPerKey(scored, keys = Seq("doc_id"),
            order = Seq(graft.plans.TopKPerKey.desc("tfidf"),
              graft.plans.TopKPerKey.asc("word")), k = 3).count()
        }),
        // the durable model-store configuration under proof
        // (LangModel.modelPath — the jaccard indexPath pattern): rep 1
        // pays the model build (the dominant cost: two vocabulary
        // aggregations over the full bigram stream), later reps load
        // the persisted model and pay only the tokenize-and-score
        // scan — the amortization repeated corpus scoring buys. The
        // per-rep times in this op's JSON line ARE the measurement.
        "docs_bigram_logprob" -> (() =>
          graft.functions.LangModel.bigramLogprob(docs, "doc_id", "text",
            modelPath = Some(s"$work/bgm_$n")).count()),
        // BPE training (the bench rows measure the steady state off
        // the persisted tokenizer, so the BUILD's scaling lives
        // here): one corpus scan into word counts, then nMerges
        // VOCABULARY-sized rounds (≤800 distinct words whatever n
        // is) — expect ≈ the cost of the word-count scan, flat
        // rounds.
        "docs_bpe_train" -> (() =>
          graft.functions.Text.bpeMerges(docs, "doc_id", "text", 4)
            .count()),
        // DEEP train — the incremental trainer's claim under proof:
        // past the one corpus scan, every round's cost follows the
        // AFFECTED words (delta pair maintenance + a vocabulary-state
        // filter scan), so 2048 rounds at n and 10n should cost ~the
        // same (the ~800-word vocabulary saturates long before 50k
        // docs). The old full-recount trainer paid a whole-vocabulary
        // windowed re-aggregation per round AND was capped at 256.
        // Returns the learned merge count (the corpus exhausts merges
        // data-dependently; the count rides the rows field).
        "docs_bpe_train_deep" -> (() =>
          graft.functions.Text.bpeTrainIncremental(
            docs, "text", 2048)._1.size.toLong),
        // REAL-VOCABULARY deep train: the standard corpus's ~800-word
        // vocabulary exhausts its pair types near Σ|word| ≈ 3k merges,
        // so production merge budgets (16k-100k) need an open-scale
        // vocabulary — this leg trains SPARK_GRAFT_BPE_MERGES (default
        // 16384) merges over a 2n-word-vocabulary corpus with durable
        // checkpoints (resumable; reps after the first resume from the
        // finished state). The JSON line carries the two numbers the
        // claim is about: s/round at real vocabulary scale, and the
        // driver's RSS with the vocabulary-scale pair map resident.
        "docs_bpe_train_wide" -> (() => {
          val budget = sys.env.get("SPARK_GRAFT_BPE_MERGES")
            .map(_.toInt).getOrElse(16384)
          val dDir = s"$work/docs_wide_$n"
          val ckDir = s"$work/bpeckpt_wide_$n"
          // existence probe through the Hadoop FS API (the same API
          // the write below uses) — java.io.File is always false on a
          // non-local work root (hdfs://, s3a://), which would silently
          // regenerate + rewrite the corpus every rep and skew the
          // timed leg
          val dPath = new org.apache.hadoop.fs.Path(dDir)
          val dFs = dPath
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!dFs.exists(dPath))
            CorpusGenerator.documents(spark, n,
                vocab = math.max(800L, 2 * n))
              .write.mode("overwrite").parquet(dDir)
          val wdocs = spark.read.parquet(dDir)
          val t0 = System.nanoTime()
          val (ms, _, pc) = graft.functions.Text.bpeTrainIncremental(
            wdocs, "text", budget, checkpointDir = Some(ckDir))
          val secs = (System.nanoTime() - t0) / 1e9
          val rssMb = scala.util.Try {
            val src = scala.io.Source.fromFile("/proc/self/status")
            try src.getLines().find(_.startsWith("VmRSS"))
              .get.trim.split("\\s+")(1).toLong / 1024
            finally src.close()
          }.getOrElse(-1L)
          // Locale.ROOT-pinned number formatting: the default-locale f
          // interpolator emits "3,1" under comma-decimal locales —
          // invalid JSON
          def num(fmt: String, v: Double): String =
            String.format(java.util.Locale.ROOT, fmt, Double.box(v))
          println(s"""{"bpe_wide":{"n":$n,"merges":${ms.size},""" +
            s""""pair_types":${pc.size},"sec":${num("%.1f", secs)},""" +
            s""""s_per_round":${num("%.4f",
              secs / math.max(1, ms.size))},""" +
            s""""driver_rss_mb":$rssMb}}""")
          ms.size.toLong
        }),
        // DSIR: one tokenize pass folded to per-doc bucket histograms
        // (map-side combinable — the shuffle carries ≤ docs×B rows,
        // never raw tokens), a ≤B-row collected model, broadcast
        // scoring. Expect ~linear in corpus bytes, nothing worse.
        "docs_dsir_weights" -> (() =>
          graft.functions.Dsir.importanceWeights(docs, "doc_id", "text",
            col("lang") === "en", 1024,
            stage = _.localCheckpoint(true)).count()),
        // standing-table co-located join: docs ⋈ embedding metadata on
        // id — two CORPUS-SIZED sides, the case broadcast can never
        // cover and bucketing exists for. Rep 1 pays the one-time
        // layout shuffle (ensureBucketed write-once contract); later
        // reps read pre-partitioned buckets and the join plans with
        // zero Exchange (asserted, broadcast disabled so small n can't
        // fake it). The per-rep curve IS the amortization record; the
        // exponent is measured on the min (steady state). Bucket count
        // scales with n — the layout contract's "total size / target
        // file size" sizing, here ~2k rows/bucket.
        "bucketed_join_agg" -> (() => {
          import graft.operators.Bucketed
          val bk = math.max(8, (n / 2000L).toInt)
          val ft = s"g_scale_docs_$n"; val dt = s"g_scale_emb_$n"
          Bucketed.ensureBucketed(
            docs.select(col("doc_id"), col("source"), col("n_chars")),
            ft, "doc_id", bk)
          Bucketed.ensureBucketed(
            emb.select(col("vec_id").as("doc_id"), col("label")),
            dt, "doc_id", bk)
          val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          try
            Bucketed.assertCoLocated(Bucketed.join(spark, ft, dt, "doc_id"))
              .groupBy(col("label"))
              .agg(avg(col("n_chars")).as("avg_chars")).count()
          finally
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        }),
        // Shard-composed sequence packing: the running sum partitions
        // by (source, shard) with shard COUNT scaling with the corpus
        // (~2k docs/shard), so per-partition window size stays
        // constant as n grows — the pack family's structural fix
        // under proof (a per-source spine serializes each source into
        // one task at corpus-fraction sizes). Expect ~linear
        // (tokenize-scan-bound), with no single-partition cliff at 10×.
        "docs_pack_sharded" -> (() => {
          val nSh = math.max(4L, n / 2000L)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"), col("shard"))
            .orderBy(col("doc_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)
          docs.select(col("doc_id"), col("source"),
              pmod(Hashing.hash60(col("doc_id").cast("string")), lit(nSh))
                .cast("int").as("shard"),
              size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
            .withColumn("start_offset",
              coalesce(sum(col("n_tokens")).over(w), lit(0L)))
            .withColumn("seq_idx",
              floor(col("start_offset") / lit(512)).cast("long"))
            .count()
        }),
        // corpus topic clustering: per iteration one broadcast
        // assignment join (k-row build side) + one posexplode
        // aggregation — linear corpus passes, exponent should be ~1
        "embed_kmeans" -> (() =>
          Similarity.kmeans(emb, 16, 2)._1.count()),
        "embed_topk_lsh" -> (() =>
          Similarity.lshBucketedTopK(emb, queries, 10,
            planes = planesFor(n), dims = 64, tables = 8).count()),
        // CDC snapshot diff: full-row fingerprint anti-join of two
        // versions differing in 1% of rows — the read an incremental
        // pipeline does INSTEAD of rescanning the table, so its own
        // cost must stay linear-ish in snapshot size (one hash
        // shuffle of 32-byte fingerprints, same shape as exact dedup)
        "upsert_changes_between" -> (() => {
          val dir = s"$work/cdc_$n"
          val hfs = org.apache.hadoop.fs.FileSystem
            .get(spark.sparkContext.hadoopConfiguration)
          hfs.delete(new org.apache.hadoop.fs.Path(dir), true)
          val sink = new graft.operators.ParquetUpsertSink(
            dir, Seq("doc_id"), retainVersions = 3)
          sink.upsert(spark, docs.select("doc_id", "source", "n_chars"),
            batchId = 0)
          sink.upsert(spark,
            docs.filter(pmod(col("doc_id"), lit(100L)) === 0)
              .select(col("doc_id"), col("source"),
                (col("n_chars") + 1L).as("n_chars")),
            batchId = 1)
          sink.changesBetween(spark, 0, 1).count()
        }),
        // Incremental view maintenance vs recompute — the refresh-cost
        // asymmetry IncrementalAgg exists for. Setup (sink, initial
        // view, 1% update + delete, PRE-MATERIALIZED feed — the
        // deployment shape: one feed, many downstream views advance
        // from it) runs once lazily; the timed thunks measure ONLY
        // advance (O(delta + view)) vs full recompute (O(table)).
        // collect (20 rows), NOT count: a count() of the view lets
        // column pruning elide the sum columns entirely — the
        // tokenize never runs and both legs measure job overhead
        "incr_agg_advance" -> (() => {
          val (view0, feed, _) = ivmSetup(n, docs)
          graft.operators.IncrementalAgg.advance(
            view0, ivmTokens(feed), Seq("source"), Seq("n_toks"))
            .collect().length.toLong
        }),
        "incr_agg_recompute" -> (() => {
          val (_, _, sink) = ivmSetup(n, docs)
          graft.operators.IncrementalAgg.view(
            ivmTokens(sink.read(spark)), Seq("source"), Seq("n_toks"))
            .collect().length.toLong
        }),
        // File-level data skipping: a FIXED-WIDTH id window (constant
        // matching rows as n grows) through the stats-manifest scan vs
        // the full read+filter. Measurement honesty: at one-box sizes
        // BOTH wall-clocks are flat — a two-narrow-column vectorized
        // scan is job-overhead-bound at any n a single JVM holds (the
        // same trap the IVM recompute leg documents), so the exponent
        // pair only proves scan adds no regression. The 100 TB claim
        // lives in the `scan_pruned_files` line skipSetup prints: the
        // kept/total FILE counts — each eliminated file is a task, an
        // open, and a footer fetch a 1000-executor cluster never pays.
        "scan_pruned" -> (() => {
          val sink = skipSetup(n, docs)
          sink.scan(spark, col("doc_id").between(0L, 999L) &&
            col("n_chars") > 200L).count()
        }),
        "scan_full" -> (() => {
          val sink = skipSetup(n, docs)
          sink.read(spark).filter(col("doc_id").between(0L, 999L) &&
            col("n_chars") > 200L).count()
        }),
        // Bloom point lookup on the NON-clustered key (wall time
        // flat-ish on one box, like scan_pruned — the cluster-scale
        // claim is the bloom_pruned_files line bloomSetup prints)
        "scan_bloom_point" -> (() => {
          val sink = bloomSetup(n, docs)
          sink.scan(spark, col("doc_id") === lit(n / 2)).count()
        }),
        // Dynamic file pruning end to end: 16 spread keys against the
        // same table (dfp_pruned_files carries the file-count story)
        "scan_join_prune" -> (() => {
          val sink = bloomSetup(n, docs)
          val keys = spark.range(16).select((col("id") * lit(n / 16))
            .as("doc_id"))
          sink.scanForJoin(spark, "doc_id", keys).count()
        }),
        // Delta-built partitioned CDC: fixed-size commit against a
        // growing history table — the feed reads only the touched
        // directory's old+new files, so the exponent should sit ~0
        // where the versioned snapshot-diff (`upsert_changes_between`)
        // follows table size
        "part_feed_delta" -> (() => {
          val sink = partFeedSetup(n, docs)
          sink.changeFeed(spark, 0L, 1L, withPreimages = true).count()
        }),
        // COUNT(DISTINCT) maintenance vs recompute — same asymmetry
        // claim as the sum pair: advance touches the delta + the
        // multiplicity state, recompute re-tokenizes the corpus
        "incr_distinct_advance" -> (() => {
          val (_, feed, _) = ivmSetup(n, docs)
          val st0 = distinctSetup(n, docs)
          val st1 = graft.operators.IncrementalAgg.advanceDistinct(
            st0, ivmTokens(feed), Seq("source"), "n_toks")
          graft.operators.IncrementalAgg.readDistinct(
            st1, Seq("source"), "n_toks").collect().length.toLong
        }),
        "incr_distinct_recompute" -> (() => {
          val (_, _, sink) = ivmSetup(n, docs)
          graft.operators.IncrementalAgg.readDistinct(
            graft.operators.IncrementalAgg.distinctState(
              ivmTokens(sink.read(spark)), Seq("source"), "n_toks"),
            Seq("source"), "n_toks").collect().length.toLong
        }),
        // SQ8 brute force over the persisted codes table: rep 1 pays
        // the quantize-and-write, later reps scan 1-byte codes only.
        // The exponent SHOULD be ~1 — SQ8 is the bandwidth play, not
        // the complexity play (its scan is linear; LSH/IVF above are
        // the sublinear paths) — so this row is the honest baseline
        // the bucketed/pruned paths are compared against
        "embed_topk_sq8" -> (() =>
          Similarity.sq8TopK(emb, queries, 10, rerank = 40,
            codesPath = Some(s"$work/sq8_$n")).count()),
        // flat PQ and the IVF-PQ composition: both are ONE fused
        // encode+ADC corpus scan; ivfpq adds the coarse-quantize pass
        // and gates each query's ADC to its probed cells (the scan
        // itself still reads every code — partition-level pruning is
        // the persisted-index path above)
        "embed_topk_pq" -> (() =>
          Similarity.pqTopK(emb, queries, 5, m = 8, nCodes = 16,
            rerank = 40).count()),
        "embed_topk_ivfpq" -> (() =>
          Similarity.ivfPqTopK(emb, queries, 5, nCells = cellsFor(n),
            nProbe = 4, m = 8, nCodes = 16, rerank = 40).count()),
        // the STEADY-STATE IVF-PQ: trained codebook + cached coarse
        // quantizer + cell-PARTITIONED persisted codes — rep 1 pays
        // the builds, later reps probe with the coarse filter
        // partition-pruning the codes scan to the probed cells
        // (~nProbe·|queries|/nCells of the table at worst)
        "embed_topk_ivfpq_indexed" -> (() => {
          val (cb, quant, codes) = pqIdxSetup(n, emb)
          Similarity.ivfPqTopK(emb, queries, 5, nCells = cellsFor(n),
            nProbe = 4, m = 8, nCodes = 16, rerank = 40,
            codebook = Some(cb), quantized = Some(quant),
            codes = Some(codes)).count()
        }),
        "embed_topk_ivf_indexed" -> (() => {
          val idx = new IvfIndex(s"$work/ivf_$n", nCells = cellsFor(n))
          idx.build(emb)
          idx.topK(spark, queries, 10, nProbe = 8).count()
        }),
        // Distributed restore copy-back at full task parallelism vs
        // forced single-task: the wall-clock pair is the proof the
        // byte path is executor-parallel (see restoreSetup's
        // restore_delta line for the moved file/byte volume)
        "restore_copyback" -> (() => restoreRoundtrip(n, docs)),
        "restore_copyback_serial" -> (() => {
          spark.conf.set("graft.upsert.restoreCopySlices", "1")
          try restoreRoundtrip(n, docs)
          finally spark.conf.unset("graft.upsert.restoreCopySlices")
        }))
    }

    val results = scala.collection.mutable.Map.empty[(String, Long), Double]
    // Locale.ROOT-pinned (comma-decimal locales would emit invalid JSON)
    def num3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    for (n <- Seq(small, big)) {
      // shuffle partitions scale with the corpus, exactly as a real
      // cluster sizes them: the jaccard shuffle_hash join builds one
      // in-memory hash relation per partition, so partition count —
      // not heap — is the knob that keeps the build side bounded as
      // data grows (~2k docs of shingles per partition here)
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(cpus.toInt, (n / 2000L).toInt).toString)
      val (docs, emb) = corpus(n)
      // optional comma-separated op filter for focused reruns
      // (e.g. SPARK_GRAFT_SCALE_ONLY=docs_bigram_logprob)
      val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      // verified-pair edge list for the CC op, built once outside
      // its timer (its generation cost is the jaccard op's own number)
      if (only.forall(_.contains("dedup_clusters")))
        Dedup.jaccardPairs(
            Dedup.docShingleHashes(docs, "doc_id", "text", 3), 0.8,
            maxShingleDf = 128, indexPath = Some(s"$work/jix0_$n"))
          .select(col("doc_a"), col("doc_b"))
          .write.mode("overwrite").parquet(s"$work/pairs_$n")
      val selected = ops(n, docs, emb).filter { case (name, _) =>
        only.forall(_.contains(name))
      }
      // IVM setup (sink writes, upserts, delete, feed checkpoint) is
      // paid HERE, not inside rep 1 of whichever timed thunk runs
      // first — the timed reps must measure only advance vs recompute
      if (selected.exists(_._1.startsWith("incr_")))
        ivmSetup(n, docs)
      if (selected.exists(_._1.startsWith("incr_distinct")))
        distinctSetup(n, docs)
      // same for the skip-scan tables (snapshot write + compaction)
      if (selected.exists(_._1.startsWith("scan_")))
        skipSetup(n, docs)
      if (selected.exists(s => s._1 == "scan_bloom_point" ||
          s._1 == "scan_join_prune"))
        bloomSetup(n, docs)
      if (selected.exists(_._1 == "part_feed_delta"))
        partFeedSetup(n, docs)
      if (selected.exists(_._1.startsWith("restore_copyback")))
        restoreSetup(n, docs)
      if (selected.exists(s => s._1.startsWith("admit_") &&
          s._1 != "admit_split" && s._1 != "admit_maint_manifest" &&
          s._1 != "admit_remove_manifest"))
        admitSetup(n, docs)
      if (selected.exists(_._1 == "admit_split"))
        admitSplitSetup(n, docs)
      if (selected.exists(_._1 == "admit_maint_manifest"))
        admitManifestSetup(n, docs)
      if (selected.exists(_._1 == "admit_remove_manifest"))
        admitRemoveSetup(n, docs)
      for ((name, f) <- selected) {
        val (sec, times, rows) = timeReps(f)
        results((name, n)) = sec
        val repsJson = times.map(num3).mkString("[", ",", "]")
        println(s"""{"op":"$name","n":$n,"sec":${num3(sec)},""" +
          s""""reps":$repsJson,"rows":$rows}""")
      }
    }
    val summary = results.keys.map(_._1).toSeq.distinct.sorted.map { name =>
      val e = math.log(results((name, big)) / results((name, small))) /
        math.log(factor.toDouble)
      s""""$name":${num3(e)}"""
    }.mkString(",")
    println(s"""{"metric":"scaling_exponent","factor":$factor,$summary}""")
    spark.stop()
  }
}
