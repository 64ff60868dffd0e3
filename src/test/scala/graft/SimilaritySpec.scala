package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Similarity search: brute-force correctness against a driver-side
  * recomputation, and ANN recall of the LSH path vs brute force.
  */
class SimilaritySpec extends SparkTestBase {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("brute-force top-k matches a driver-side recomputation") {
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 3), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (q <- 0L until 3L) {
      val expected = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(all(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      val actual = (1 to 5).map(rk => got((q, rk.toLong)))
      assert(actual === expected, s"query $q top-5 mismatch")
    }
  }

  test("LSH bucketed ANN achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity
      .lshBucketedTopK(emb, queries, 5, planes = 4, dims = 64, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ANN recall@5 with 8 tables x 4 planes: $recall%.3f")
    assert(recall > 0.5, f"recall collapsed: $recall%.3f")
    // every approx hit must still be correctly cosine-ranked: rank 1
    // neighbors of exact search found in approx must agree on id order
    assert(approx.nonEmpty)
  }

  test("SQ8 quantization: codes bounded, reconstruction error bounded") {
    val qz = graft.functions.Similarity.sq8Quantize(emb).collect()
    assert(qz.nonEmpty)
    qz.foreach { r =>
      val codes = r.getSeq[Byte](1)
      val scale = r.getDouble(2)
      assert(codes.forall(c => c >= -127 && c <= 127),
        s"code out of SQ8 range for vec ${r.getLong(0)}")
      assert(scale > 0.0)
      // round-half-up quantization error is ≤ scale/2 per component
      val orig = emb.filter(col("vec_id") === r.getLong(0))
        .head().getSeq[Float](1)
      orig.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"reconstruction error above scale/2 for vec ${r.getLong(0)}")
      }
    }
  }

  test("SQ8 zero vector: scale defaults to 1, codes all zero, norm 0") {
    import spark.implicits._
    val z = Seq((0L, Array.fill(4)(0.0f)), (1L, Array(1.0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = graft.functions.Similarity.sq8Quantize(z).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(0L).getDouble(2) === 1.0, "zero vector must take scale 1")
    assert(q(0L).getSeq[Byte](1).forall(_ == 0))
    assert(q(0L).getDouble(3) === 0.0)
    // and it must not poison a ranking: its approx score is NULL
    // (try_divide) and drops out instead of sorting above real scores
    val top = graft.functions.Similarity
      .sq8TopK(z, z.filter(col("vec_id") === 1L), 1, rerank = 1)
      .collect()
    assert(top.length === 0 || top.forall(!_.isNullAt(3)),
      "zero-norm member leaked a NULL/NaN score into the ranking")
  }

  test("SQ8 top-k with exact re-rank achieves high recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.sq8TopK(emb, queries, 5, rerank = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"SQ8 recall@5 (rerank 20): $recall%.3f")
    // 8-bit codes barely perturb a 64-dim cosine ordering; with a 4x
    // re-rank margin the short list should almost always contain the
    // true top-5
    assert(recall > 0.9, f"SQ8 recall collapsed: $recall%.3f")
  }

  test("IVF probe achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@5 with 16 cells, 4 probes: $recall%.3f")
    assert(recall > 0.3, f"recall collapsed: $recall%.3f")
  }

  test("embedding near-dup pairs: planted duplicates found, output exact") {
    import spark.implicits._
    // plant an exact duplicate pair (ids 1000/1001) among real vectors
    val planted = emb.limit(1).select(col("embedding")).as[Array[Float]].head()
    val extra = Seq((1000L, planted), (1001L, planted))
      .toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).union(extra)
    val pairs = graft.functions.Similarity
      .embeddingNearDupPairs(corpus, 0.4, planes = 4, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical vectors always share every bucket → must be found at 1.0
    assert(pairs((1000L, 1001L)) === 1.0, s"planted dup missed: $pairs")
    // every reported pair must be a TRUE positive: re-verify against
    // driver-side exact cosine (candidate generation may MISS pairs —
    // that's LSH recall — but must never fabricate or mis-score one)
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    pairs.foreach { case ((x, y), s) =>
      val exact = cos(vecs(x), vecs(y))
      assert(math.abs(exact - s) < 1e-5, s"pair ($x,$y) score $s vs $exact")
      assert(s >= 0.4)
    }
  }

  test("near-dup hot-bucket guard drops identical-vector mega-clusters") {
    import spark.implicits._
    // 200 clones of one real vector: identical vectors land in the
    // same bucket of EVERY table — more planes can never split them —
    // so unguarded candidate generation emits C(200,2) pairs.
    val planted = emb.limit(1).select(col("embedding")).as[Array[Float]].head()
    val clones = (1000L until 1200L).map(i => (i, planted))
      .toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).union(clones)
    val unguarded = graft.functions.Similarity
      .embeddingNearDupPairs(corpus, 0.99, planes = 4, dims = 64)
    assert(unguarded.count() >= 200L * 199 / 2,
      "clone cluster should dominate unguarded output")
    val guarded = graft.functions.Similarity
      .embeddingNearDupPairs(corpus, 0.99, planes = 4, dims = 64,
        maxBucketSize = 50)
    val clonePairs = guarded.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => a >= 1000L && b >= 1000L }
    assert(clonePairs === 0, "guard must remove the clone cluster's buckets")
  }

  test("semDedup marks within-cell near-duplicates; min id survives") {
    import spark.implicits._
    // four orthogonal seed directions (= the nCells seeds), two exact
    // copies of vector 0, one near-copy (cosine .994), and one
    // equidistant vector that is alone near its seed
    val vecs = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0f, 0f, 1f, 0f),
      3L -> Array(0f, 0f, 0f, 1f),
      4L -> Array(1f, 0f, 0f, 0f),
      5L -> Array(1f, 0f, 0f, 0f),
      6L -> Array(0.9f, 0.1f, 0f, 0f),
      7L -> Array(0.5f, 0.5f, 0f, 0f))
    val corpus = vecs.toDF("vec_id", "embedding")
    val got = graft.functions.Similarity
      .semDedup(corpus, nCells = 4, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(0L -> false, 1L -> false, 2L -> false,
      3L -> false, 4L -> true, 5L -> true, 6L -> true, 7L -> false))
  }

  test("semDedup cell-size guard drops degenerate mega-cells") {
    import spark.implicits._
    // seeds are the first 2 ids, so id 1 must be the healthy
    // direction; ids 0 and 2..100 are a 100-clone mega-cell
    val clones = (0L +: (2L to 100L)).map(i => i -> Array(1f, 0f, 0f, 0f))
    val corpus = (clones :+ (1L -> Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val unguarded = graft.functions.Similarity
      .semDedup(corpus, nCells = 2, threshold = 0.95)
    assert(unguarded.filter(col("is_duplicate")).count() === 99)
    val guarded = graft.functions.Similarity
      .semDedup(corpus, nCells = 2, threshold = 0.95, maxCellSize = 50)
    // the clone cell is dropped entirely (logged), the healthy cell
    // survives untouched
    val kept = guarded.collect().map(r => r.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("persisted IVF index matches the per-call path and prunes partitions") {
    val queries = emb.filter(col("vec_id") < 8)
    val idx = new graft.functions.IvfIndex(tmpDir("ivfidx"), nCells = 16)
    idx.build(emb)
    assert(idx.exists(spark))
    val fromIndex = idx.topK(spark, queries, 5, nProbe = 4)
    val perCall = Similarity.ivfTopK(emb, queries, 5, nCells = 16, nProbe = 4)
    assert(fromIndex.except(perCall).count() === 0 &&
      perCall.except(fromIndex).count() === 0,
      "index probe diverged from the per-call quantizer")
    // The probe scan must be partition-pruned: the cell filter has to
    // reach the file scan as a PartitionFilter, not a post-scan Filter.
    // Spark renders the pushed cell filter as IN below
    // spark.sql.optimizer.inSetConversionThreshold distinct values and
    // INSET above it — both prune; accept either.
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[cell#\\d+ IN.*"),
      s"no IN/INSET partition filter on the assigned scan:\n$plan")
  }

  test("IVF probe cache is generation- and session-scoped: a second " +
      "SparkSession and a post-append probe both see correct state") {
    val queries = emb.filter(col("vec_id") < 8)
    val idx = new graft.functions.IvfIndex(tmpDir("ivfsess"), nCells = 16)
    idx.build(emb.filter(col("vec_id") < 200))
    val r1 = idx.topK(spark, queries, 5, nProbe = 4).collect().toSet
    // a DIFFERENT session must not be handed frames bound to the
    // first (DataFrames are session-scoped); the cache rebuilds
    val s2 = spark.newSession()
    val r2 = idx.topK(s2, s2.createDataFrame(
      java.util.Arrays.asList(queries.collect(): _*),
      queries.schema), 5, nProbe = 4).collect().toSet
    assert(r2 === r1, "cross-session probe diverged")
    // a mutation commit changes the manifest key: the next probe must
    // serve the NEW generation, not the cached one — probing with an
    // appended vector's value (fresh query id; wide nProbe so the
    // centroid ranking surely reaches its nearest-seed cell) must
    // return that vector at score 1.0, and it exists only in the
    // post-append segments
    idx.append(emb.filter(col("vec_id") >= 200))
    val appendedQ = emb.filter(col("vec_id") === 230)
      .select(lit(99999L).as("vec_id"), col("embedding"))
    val hits = idx.topK(spark, appendedQ, 3, nProbe = 16).collect()
    assert(hits.exists(r => r.getLong(2) === 230L && r.getDouble(3) === 1.0),
      s"post-append probe served a stale cached generation: ${hits.toSeq}")
  }

  test("IVF append assigns like a rebuild over the frozen quantizer") {
    val dir = tmpDir("ivfapp")
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val idx = new graft.functions.IvfIndex(dir, nCells = 16)
    idx.build(half)
    idx.append(rest)
    assert(idx.exists(spark), "append left the index invalid")
    // assignment parity: the seeds are the 16 smallest ids, present in
    // BOTH corpora, so a full rebuild uses the same frozen quantizer —
    // every appended vector must land in the same cell
    val full = new graft.functions.IvfIndex(tmpDir("ivffull"), nCells = 16)
    full.build(emb)
    def cells(i: graft.functions.IvfIndex) = i.assignedRows(spark)
      .select(col("cid"), col("cell").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(idx) === cells(full),
      "appended assignments diverge from a full rebuild")
    // appended vectors are retrievable: probing with an appended
    // vector's value (fresh query id, so self-exclusion doesn't hide
    // it) must return that vector at score 1.0
    val probe = rest.filter(col("vec_id") === 300)
      .select(lit(99999L).as("vec_id"), col("embedding"))
    val hits = idx.topK(spark, probe, 3, nProbe = 8).collect()
    assert(hits.exists(r => r.getLong(2) === 300L && r.getDouble(3) === 1.0),
      s"appended vector not retrievable: ${hits.toSeq}")
  }

  test("IVF append replay is idempotent (retried batch adds no rows)") {
    val dir = tmpDir("ivfreplay")
    // leave ids 240..249 OUT of the index so the mixed batch below has
    // genuinely new rows to contribute
    val base = emb.filter(col("vec_id") < 240)
    val rest = emb.filter(col("vec_id") >= 250)
    val idx = new graft.functions.IvfIndex(dir, nCells = 16)
    idx.build(base)
    idx.append(rest)
    val after1 = idx.assignedRows(spark).count()
    assert(after1 === 490L)
    // a retried delivery of the SAME batch must be a no-op: the frozen
    // quantizer re-assigns each id to its existing cell, where the
    // anti-join filters it
    idx.append(rest)
    assert(idx.exists(spark), "replayed append left the index invalid")
    val after2 = idx.assignedRows(spark).count()
    assert(after2 === after1, s"replayed append duplicated rows: $after1 -> $after2")
    // and a partially-new batch appends only the new ids
    idx.append(emb.filter(col("vec_id") >= 240)) // 240..249 new, rest replay
    val after3 = idx.assignedRows(spark).count()
    assert(after3 === after1 + 10,
      s"mixed replay batch should add exactly 10 rows: $after1 -> $after3")
    assert(idx.assignedRows(spark).select("cid").distinct().count()
      === after3, "duplicate ids present in the index")
  }

  test("IVF remove/compact: rebuild parity, physical rewrite, re-add cycle") {
    val dir = tmpDir("ivfrm")
    val idx = new graft.functions.IvfIndex(dir, nCells = 16)
    idx.build(emb)
    val isRemoved = col("vec_id") >= 400 && col("vec_id") < 420
    val removed = emb.filter(isRemoved)
    idx.remove(removed)
    assert(idx.exists(spark), "remove left the index invalid")
    val queries = emb.filter(col("vec_id") < 8)
    // nProbe = nCells probes every cell, so results are the exact
    // cosine top-k over the LIVE rows — comparable 1:1 with a
    // from-scratch rebuild on the filtered corpus even though the
    // original index keeps its as-built centroids. (The seeds are the
    // 16 smallest ids, none removed, so the rebuild's quantizer
    // assigns the survivors identically.)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val logical = rows(idx.topK(spark, queries, 10, nProbe = 16))
    assert(!logical.exists(r => { val id = r(2).asInstanceOf[Long]
      id >= 400L && id < 420L }), "tombstoned id surfaced in topK")
    val rebuilt = new graft.functions.IvfIndex(tmpDir("ivfrm2"), nCells = 16)
    rebuilt.build(emb.filter(!isRemoved))
    assert(logical === rows(rebuilt.topK(spark, queries, 10, nProbe = 16)),
      "tombstoned index diverged from a rebuild on the filtered corpus")
    // physical compaction changes nothing logically…
    idx.compact(spark)
    assert(idx.exists(spark), "compact left the index invalid")
    assert(logical === rows(idx.topK(spark, queries, 10, nProbe = 16)),
      "compacted index diverged from its own tombstoned results")
    // …but clears the dead rows and the tombstone set
    val assigned = idx.assignedRows(spark)
    assert(assigned.count() === 480L &&
      assigned.filter(col("cid") >= 400 && col("cid") < 420).count() === 0L,
      "compact did not physically remove dead rows")
    assert(idx.tombstoneIds(spark).isEmpty,
      "compact did not clear the tombstone set")
    // full lifecycle: a compacted id can be re-added
    idx.append(removed)
    assert(idx.assignedRows(spark).count() === 500L)
    // a consolidating compaction squashes the fragmented segment list
    // (build + compact + append) into one clean segment — identical
    // logical contents, space reclaimed at GC
    val beforeSquash = rows(idx.topK(spark, queries, 10, nProbe = 16))
    idx.compact(spark, consolidate = true)
    assert(idx.assignedRows(spark).count() === 500L &&
      rows(idx.topK(spark, queries, 10, nProbe = 16)) === beforeSquash,
      "consolidating compaction changed the index contents")
  }

  test("IVF append of a tombstoned id fails until compacted") {
    val dir = tmpDir("ivfrmclash")
    val idx = new graft.functions.IvfIndex(dir, nCells = 16)
    idx.build(emb)
    val one = emb.filter(col("vec_id") === 450)
    idx.remove(one)
    // re-adding while the dead row is still physically present would
    // resurrect it beside the new row as a duplicate — must refuse
    val ex = intercept[IllegalArgumentException] { idx.append(one) }
    assert(ex.getMessage.contains("compact"), ex.getMessage)
    assert(idx.exists(spark), "failed append left the index invalid")
    idx.compact(spark)
    idx.append(one) // now a plain append
    assert(idx.assignedRows(spark)
      .filter(col("cid") === 450).count() === 1L)
  }

  test("IVF crash mid-compact leaves the old generation fully served") {
    // the lock-free property, crash half: a compact that dies AFTER
    // writing its cleaned segment but BEFORE the manifest flip must
    // leave readers on the previous generation — tombstoned view,
    // no error, no partial state
    val dir = tmpDir("ivftorn")
    class CrashingIndex extends graft.functions.IvfIndex(dir, nCells = 16) {
      var arm = false
      override protected def beforeCommit(version: Long): Unit =
        if (arm) throw new RuntimeException("simulated crash before commit")
    }
    val idx = new CrashingIndex
    idx.build(emb)
    idx.remove(emb.filter(col("vec_id") === 123))
    val before = idx.topK(spark, emb.filter(col("vec_id") < 4), 5, nProbe = 16)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    idx.arm = true
    intercept[RuntimeException] { idx.compact(spark) }
    idx.arm = false
    // the torn attempt is invisible: index valid, same results,
    // tombstones still pending
    assert(idx.exists(spark), "crashed compact corrupted the index")
    assert(idx.topK(spark, emb.filter(col("vec_id") < 4), 5, nProbe = 16)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq === before,
      "crashed compact changed visible results")
    assert(idx.tombstoneIds(spark).nonEmpty, "crashed compact ate tombstones")
    // recovery: re-running the compact completes it
    idx.compact(spark)
    assert(idx.tombstoneIds(spark).isEmpty)
    // a rebuild must drop the previous generation's tombstones, or a
    // legitimately-rebuilt id would be silently filtered from probes
    idx.remove(emb.filter(col("vec_id") === 200))
    idx.build(emb)
    val probe = emb.filter(col("vec_id") === 200)
      .select(lit(99999L).as("vec_id"), col("embedding"))
    val hits = idx.topK(spark, probe, 3, nProbe = 16).collect()
    assert(hits.exists(r => r.getLong(2) === 200L && r.getDouble(3) === 1.0),
      s"stale tombstone leaked across the rebuild: ${hits.toSeq}")
  }

  test("IVF mutations are lock-free: concurrent topK never errors, no dupes") {
    // the lock-free property, live half: a reader thread hammering
    // topK while the writer appends, removes, and compacts must never
    // observe an error (the old design's centroids-rename window made
    // every concurrent probe throw) and the final index must hold no
    // duplicate ids
    val dir = tmpDir("ivfconc")
    // heavy mutation under live readers: raise retention so no
    // generation a reader may have resolved is GC'd mid-probe (the
    // documented knob; 2 would suffice for the default mutation rate)
    val idx = new graft.functions.IvfIndex(dir, nCells = 16,
      retainVersions = 12)
    idx.build(emb.filter(col("vec_id") < 300))
    val queries = emb.filter(col("vec_id") < 4)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val n = idx.topK(spark, queries, 5, nProbe = 8).count()
          assert(n > 0)
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => readerErr.set(t) }
    })
    reader.start()
    try {
      (0 until 4).foreach { i =>
        idx.append(emb.filter(col("vec_id") >= 300 + i * 50 &&
          col("vec_id") < 300 + (i + 1) * 50))
      }
      idx.remove(emb.filter(col("vec_id") >= 490))
      idx.compact(spark)
      idx.compact(spark, consolidate = true)
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(readerErr.get() === null,
      s"concurrent topK errored: ${readerErr.get()}")
    assert(reads.get() > 0, "reader thread never completed a probe")
    val fin = idx.assignedRows(spark)
    assert(fin.count() === 490L &&
      fin.select("cid").distinct().count() === 490L,
      "concurrent mutations produced duplicates or lost rows")
  }

  test("IVF concurrent appenders: every batch lands exactly once") {
    // the lock-free property, multi-WRITER half: N real threads each
    // append a disjoint id range; CAS manifest claims serialize them
    // (a lost claim re-reads the winner's manifest and retries), so
    // the final index must hold every id exactly once. This is the
    // shape that exposed the local-filesystem rename-clobber lost
    // update in the upsert sink's commit log — the index's manifest
    // log shares the claim primitive, so it gets the same stress.
    val dir = tmpDir("ivfconcw")
    val idx = new graft.functions.IvfIndex(dir, nCells = 16,
      retainVersions = 10)
    idx.build(emb.filter(col("vec_id") < 100))
    val writers = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(writers))
    try {
      val fs = (0 until writers).map { w =>
        Future {
          idx.append(emb.filter(col("vec_id") >= 100 + w * 50 &&
            col("vec_id") < 100 + (w + 1) * 50))
        }(pool)
      }
      fs.foreach(Await.result(_, Duration("180s")))
    } finally pool.shutdown()
    val fin = idx.assignedRows(spark)
    assert(fin.count() === 300L &&
      fin.select("cid").distinct().count() === 300L,
      "concurrent appends lost or duplicated a batch")
  }

  test("IVF append to a missing index fails fast") {
    val ex = intercept[IllegalArgumentException] {
      new graft.functions.IvfIndex(tmpDir("ivfnone"), nCells = 4).append(emb)
    }
    assert(ex.getMessage.contains("append"))
  }

  test("vacuum reclaims crashed-writer orphans, never a retained generation's dirs") {
    val dir = tmpDir("ivfvac")
    val idx = new graft.functions.IvfIndex(dir, nCells = 16,
      retainVersions = 2)
    idx.build(emb.filter(col("vec_id") < 200))
    idx.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 250))
    // both retained generations' manifests and dirs on disk
    val hfs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    def topNames() = hfs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    val before = topNames()
    // a writer that died after writing data but before any claim:
    // directories no manifest references
    Seq("seg-deadbeef", "centroids-deadbeef", "seeds-deadbeef",
      "tomb-deadbeef").foreach { d =>
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/$d"))
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(s"$dir/$d/part-0.parquet"), true)
      out.write(Array[Byte](1, 2, 3)); out.close()
    }
    // age horizon 0: everything unreferenced is old enough
    val reclaimed = idx.vacuum(spark, olderThanMs = 0L).toSet
    assert(reclaimed === Set("seg-deadbeef", "centroids-deadbeef",
      "seeds-deadbeef", "tomb-deadbeef"), s"reclaimed $reclaimed")
    // every directory present before the orphans were planted —
    // BOTH retained generations' — survives even at horizon 0, so a
    // reader resolved on the older generation keeps working
    assert(before.subsetOf(topNames()),
      s"vacuum touched retained dirs: ${before -- topNames()}")
    assert(idx.topK(spark, emb.filter(col("vec_id") < 3), 5, nProbe = 4)
      .count() === 15L)
    // idempotent: nothing left to reclaim
    assert(idx.vacuum(spark, olderThanMs = 0L).isEmpty)
  }

  test("kmeans: deterministic, self-consistent, partitions the corpus") {
    import org.apache.spark.sql.functions._
    val (a1, c1) = Similarity.kmeans(emb, 8, 2)
    val (a2, c2) = Similarity.kmeans(emb, 8, 2)
    // every vector assigned exactly once
    val n = emb.count()
    assert(a1.count() === n)
    assert(a1.select("cid").distinct().count() === n)
    // deterministic across runs (assignments AND centroids)
    assert(a1.collect().map(_.toString).sorted.toSeq ===
      a2.collect().map(_.toString).sorted.toSeq)
    assert(c1.collect().map(_.toString).sorted.toSeq ===
      c2.collect().map(_.toString).sorted.toSeq)
    // assignments reference only returned centroids
    val cells = c1.select("cell").collect().map(_.getLong(0)).toSet
    assert(a1.select("cell").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(cells))
    // self-consistency: each row's sim IS the rounded cosine to its
    // cell's centroid, and no OTHER centroid is strictly closer
    // (ties broken toward the larger cell id, the documented rule)
    val cents = c1.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
    val rows = a1.join(emb.select(col("vec_id").as("cid"),
      col("embedding")), "cid").collect()
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val vec = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      val cell = r.getLong(r.fieldIndex("cell"))
      val sim = r.getDouble(r.fieldIndex("sim"))
      def simTo(c: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < vec.length) {
          d += vec(i) * c(i); na += vec(i) * vec(i); nb += c(i) * c(i); i += 1
        }
        d / math.sqrt(na * nb)
      }
      assert(r6(simTo(cents(cell))) === sim)
      cents.foreach { case (other, cvec) =>
        val os = r6(simTo(cvec))
        assert(os < sim || (os == sim && other <= cell),
          s"cid ${r.getLong(0)}: cell $other (sim $os) beats $cell ($sim)")
      }
    }
    // the mixing view degenerates nowhere: sizes positive, cohesion
    // within [-1, 1]
    val sizes = a1.groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ > 0) && sizes.sum === n)
  }

  // ---------- product quantization (ADC) ----------

  test("PQ top-k with exact re-rank achieves high recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.pqTopK(emb, queries, 5, m = 8, nCodes = 16,
      rerank = 40).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ recall@5 (m=8, 16 codes, rerank 40): $recall%.3f")
    assert(recall > 0.5, f"PQ recall collapsed: $recall%.3f")
  }

  test("PQ output contract: k per query, no self, scores exact-cosine") {
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3), 5,
      m = 8, nCodes = 16, rerank = 40).collect()
    assert(rows.length === 15)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L),
        s"query $q ranks not 1..5")
      assert(!rs.exists(_.getLong(2) == q), s"query $q returned itself")
      // the published score IS the exact rounded cosine of the pair —
      // the re-rank step's contract
      rs.foreach { r =>
        val want = r6(cosine(all(q), all(r.getLong(2))))
        assert(r.getDouble(3) === want,
          s"query $q neighbor ${r.getLong(2)}: score ${r.getDouble(3)} != $want")
      }
      // ranks descend by score with id tiebreak
      val ordered = rs.sortBy(_.getLong(1))
        .map(r => (-r.getDouble(3), r.getLong(2))).toSeq
      assert(ordered === ordered.sorted, s"query $q rank order broken")
    }
  }

  test("IVF-PQ: probing ALL cells reproduces flat PQ exactly") {
    // with nProbe = nCells the coarse gate is vacuous, so the
    // composition must be bit-identical to the flat ADC path — the
    // strongest pin that the gate only ever REMOVES candidates
    val q = emb.filter(col("vec_id") < 8)
    val flat = Similarity.pqTopK(emb, q, 5, m = 8, nCodes = 16,
      rerank = 40).collect().toSet
    val composed = Similarity.ivfPqTopK(emb, q, 5, nCells = 16,
      nProbe = 16, m = 8, nCodes = 16, rerank = 40).collect().toSet
    assert(composed === flat)
  }

  test("IVF-PQ with narrow probes: contract holds, recall reasonable") {
    val q = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4,
      m = 8, nCodes = 16, rerank = 40).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq ===
        (1L to rs.length.toLong), s"query $qid ranks not contiguous")
      assert(!rs.exists(_.getLong(2) == qid), s"query $qid returned itself")
    }
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF-PQ recall@5 (16 cells, 4 probes): $recall%.3f")
    assert(recall > 0.3, f"IVF-PQ recall collapsed: $recall%.3f")
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 17)
    }
  }

  test("PQ auto-chunks >4096-query batches, bit-identical to manual chunking") {
    import spark.implicits._
    // small synthetic corpus so the >4096-literal chunk stays cheap:
    // 30 vectors, 8 dims, m=2 subspaces, 4-code books
    def vec(seed: Long): Array[Double] =
      Array.tabulate(8)(d => math.sin(seed * 31 + d * 7 + 1))
    val corpus = (0L until 30L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // 4100 queries — past the old hard 4096-query gate that made big
    // batches a caller problem; ids disjoint from the corpus
    val qAll = (0L until 4100L).map(i => (1000L + i, vec(i % 97)))
    val full = Similarity.pqTopK(corpus, qAll.toDF("vec_id", "embedding"),
      3, m = 2, nCodes = 4, rerank = 6).collect().toSet
    assert(full.map(_.getLong(0)).size === 4100 &&
      full.size === 4100 * 3, "expected 3 neighbors for each of 4100 queries")
    // the manual chunked path: caller-sized slices unioned by the
    // caller (a width that does NOT align with the auto-chunk width,
    // so the equality is not vacuous)
    val manual = qAll.grouped(1500).map(chunk =>
      Similarity.pqTopK(corpus, chunk.toDF("vec_id", "embedding"),
        3, m = 2, nCodes = 4, rerank = 6).collect().toSet)
      .reduce(_ ++ _)
    assert(full === manual,
      "auto-chunked batch diverged from the manual chunked union")
  }

  test("IVF-PQ chunked run is bit-identical and stays join-free per chunk") {
    val q = emb.filter(col("vec_id") < 20)
    val whole = Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4,
      m = 8, nCodes = 16, rerank = 40).collect().toSet
    spark.conf.set("graft.pq.chunkSize", "8")
    try {
      val chunkedDf = Similarity.ivfPqTopK(emb, q, 5, nCells = 16,
        nProbe = 4, m = 8, nCodes = 16, rerank = 40)
      // joins must NOT scale with chunk count: the only joins in the
      // whole multi-chunk plan are still the exact re-rank's two
      // broadcasts — each chunk's encode+ADC scan is join-free.
      // (plan string taken BEFORE execution: a collected AQE plan's
      // toString prints final + initial sections, double-counting)
      val p = chunkedDf.queryExecution.executedPlan.toString
      val chunked = chunkedDf.collect().toSet
      assert(chunked === whole,
        "chunkSize=8 run diverged from the single-chunk run")
      val joins = "BroadcastHashJoin".r.findAllIn(p).size
      assert(joins === 2, s"expected 2 re-rank joins, got $joins:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"a shuffle join crept into a chunk's ADC path:\n$p")
    } finally spark.conf.unset("graft.pq.chunkSize")
  }

  test("trained codebooks (256 codes, 2 Lloyd rounds) keep recall >= demo config") {
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val demo = recallOf(Similarity.pqTopK(emb, queries, 5, m = 8,
      nCodes = 16, rerank = 40))
    val trained = recallOf(Similarity.pqTopK(emb, queries, 5, m = 8,
      nCodes = 256, rerank = 40, iters = 2))
    info(f"PQ recall@5: demo(16 codes, 1 iter)=$demo%.3f " +
      f"trained(256 codes, 2 iters)=$trained%.3f")
    assert(trained >= demo,
      f"production codebook lost recall: $trained%.3f < $demo%.3f")
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, queries, 5, iters = 0)
    }
  }

  test("persisted artifacts (codebook, quantizer, codes) reproduce inline runs") {
    val q = emb.filter(col("vec_id") < 8)
    // flat PQ: trained-once codebook + encoded-once codes ≡ inline
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val codes = Similarity.pqEncode(emb, cb).localCheckpoint(true)
    val inline = Similarity.pqTopK(emb, q, 5).collect().toSet
    val reused = Similarity.pqTopK(emb, q, 5, codebook = Some(cb),
      codes = Some(codes)).collect().toSet
    assert(reused === inline, "codes-backed PQ diverged from inline")
    // IVF-PQ: cached quantizer + cell-carrying codes ≡ inline
    val quant = Similarity.ivfQuantizeCached(emb, nCells = 16)
    val cellCodes = Similarity.pqEncode(emb, cb,
      assigned = Some(quant._1)).localCheckpoint(true)
    val inlineIvf = Similarity.ivfPqTopK(emb, q, 5, nCells = 16,
      nProbe = 4).collect().toSet
    val reusedIvf = Similarity.ivfPqTopK(emb, q, 5, nCells = 16,
      nProbe = 4, codebook = Some(cb), quantized = Some(quant),
      codes = Some(cellCodes)).collect().toSet
    assert(reusedIvf === inlineIvf, "codes-backed IVF-PQ diverged from inline")
    // mismatched codebook parameters fail loudly
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, q, 5, m = 8, nCodes = 32, codebook = Some(cb))
    }
    // cell-less codes refuse the IVF-PQ composition
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, q, 5, codebook = Some(cb),
        quantized = Some(quant), codes = Some(codes)).collect()
    }
  }

  test("PqCodesStore: build+append is bit-identical to a full re-encode " +
    "(flat and IVF-PQ shapes), and probes reproduce inline runs") {
    val q = emb.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val lo = emb.filter(col("vec_id") < 250)
    val hi = emb.filter(col("vec_id") >= 250)
    // flat shape: codes rows across the two segments == one-shot encode
    val flat = new graft.functions.PqCodesStore(tmpDir("pqstore-flat"),
      m = 8, nCodes = 16)
    flat.build(lo, codebook = Some(cb))
    flat.append(hi)
    val appended = flat.codes(spark).collect().toSet
    val oneShot = Similarity.pqEncode(emb, cb).collect().toSet
    assert(appended === oneShot,
      "appended codes diverge from a full re-encode under the same codebook")
    assert(Similarity.pqTopK(emb, q, 5, codebook = Some(cb),
        codes = Some(flat.codes(spark))).collect().toSet ===
      Similarity.pqTopK(emb, q, 5).collect().toSet,
      "store-backed PQ probe diverged from inline")
    // IVF-PQ shape: frozen seeds put appended vectors in rebuild cells
    val ivf = new graft.functions.PqCodesStore(tmpDir("pqstore-ivf"),
      m = 8, nCodes = 16, nCells = Some(16))
    ivf.build(lo, codebook = Some(cb))
    ivf.append(hi)
    val quant = Similarity.ivfQuantizeCached(emb, nCells = 16)
    val cellOneShot = Similarity.pqEncode(emb, cb,
      assigned = Some(quant._1)).collect().toSet
    // partition-column read-back may narrow cell's type — compare on
    // a normalized long cell
    def norm(rows: Set[org.apache.spark.sql.Row]): Set[(Any, Seq[Int], Double, Long, Long)] =
      rows.map(r => (r.get(0), r.getSeq[Int](1), r.getDouble(2),
        r.getLong(3), r.get(4).asInstanceOf[Number].longValue))
    assert(norm(ivf.codes(spark)
        .select("cid", "pq_codes", "pq_norm", "pq_fp", "cell")
        .collect().toSet) === norm(cellOneShot),
      "appended cell codes diverge from a full re-encode")
    assert(Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4,
        codebook = Some(cb), quantized = Some(quant),
        codes = Some(ivf.codes(spark))).collect().toSet ===
      Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4)
        .collect().toSet,
      "store-backed IVF-PQ probe diverged from inline")
    // replay idempotence: a retried append adds nothing and commits
    // no new generation
    val before = flat.codes(spark).count()
    flat.append(hi)
    assert(flat.codes(spark).count() === before,
      "replayed append duplicated rows")
    // consolidate squashes the append history into one segment with
    // identical codes (and the cell layout preserved on the IVF shape)
    ivf.consolidate(spark)
    assert(norm(ivf.codes(spark)
        .select("cid", "pq_codes", "pq_norm", "pq_fp", "cell")
        .collect().toSet) === norm(cellOneShot),
      "consolidation changed the codes")
    assert(Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4,
        codebook = Some(cb), quantized = Some(quant),
        codes = Some(ivf.codes(spark))).collect().toSet ===
      Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4)
        .collect().toSet,
      "post-consolidation probe diverged")
  }

  test("PqCodesStore: concurrent appenders land exactly once; probes " +
    "stay live through appends") {
    val dir = tmpDir("pqstore-conc")
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val store = new graft.functions.PqCodesStore(dir, m = 8, nCodes = 16,
      nCells = Some(16), retainVersions = 8)
    store.build(emb.filter(col("vec_id") < 100), Some(cb))
    val q = emb.filter(col("vec_id") < 4)
    val quant = Similarity.ivfQuantizeCached(emb, nCells = 16)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          // re-resolve each probe: every read sees SOME committed
          // generation, never a torn one
          val n = Similarity.ivfPqTopK(emb, q, 5, nCells = 16, nProbe = 4,
            codebook = Some(cb), quantized = Some(quant),
            codes = Some(store.codes(spark))).count()
          assert(n > 0)
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => readerErr.set(t) }
    })
    reader.start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val writers = 3
      val pool = scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(writers))
      try {
        val fs = (0 until writers).map { w =>
          Future {
            store.append(emb.filter(col("vec_id") >= 100 + w * 50 &&
              col("vec_id") < 100 + (w + 1) * 50))
          }(pool)
        }
        fs.foreach(Await.result(_, Duration("180s")))
      } finally pool.shutdown()
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(readerErr.get() === null,
      s"concurrent probe errored: ${readerErr.get()}")
    assert(reads.get() > 0, "reader thread never completed a probe")
    val fin = store.codes(spark)
    assert(fin.count() === 250L &&
      fin.select("cid").distinct().count() === 250L,
      "concurrent appends lost or duplicated a batch")
  }

  test("codes-store generation cache is session- and generation-scoped: " +
    "cross-session reads work, post-append reads see the new segment") {
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16)
    val store = new graft.functions.PqCodesStore(tmpDir("pqstore-cache"),
      m = 8, nCodes = 16)
    store.build(emb.filter(col("vec_id") < 200), Some(cb))
    val r1 = store.codes(spark).select("cid").collect()
      .map(_.getLong(0)).toSet
    // second read of the unchanged generation reuses the cached
    // relations — identical rows
    assert(store.codes(spark).select("cid").collect()
      .map(_.getLong(0)).toSet === r1)
    // a DIFFERENT session must not be handed frames bound to the
    // first (DataFrames are session-scoped); the cache rebuilds
    val s2 = spark.newSession()
    assert(store.codes(s2).select("cid").collect()
      .map(_.getLong(0)).toSet === r1, "cross-session read diverged")
    // an append commit changes the manifest key: the next read must
    // serve the appended generation, not the cached one
    store.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 250))
    val r2 = store.codes(spark).select("cid").collect()
      .map(_.getLong(0)).toSet
    assert(r2.size === 250 && r2.contains(230L),
      s"post-append read served a stale cached generation (${r2.size} rows)")
  }

  test("PQ fingerprint refusal: foreign or unstamped codes fail loudly") {
    val q = emb.filter(col("vec_id") < 8)
    val cbA = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16)
    // same parameters, different training corpus → different centroids
    val cbB = Similarity.pqTrainCodebook(
      emb.filter(col("vec_id") >= 100), m = 8, nCodes = 16)
    assert(cbA.fingerprint !== cbB.fingerprint,
      "distinct codebooks share a fingerprint")
    val codesA = Similarity.pqEncode(emb, cbA).localCheckpoint(true)
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, q, 5, codebook = Some(cbB),
        codes = Some(codesA))
    }
    assert(ex.getMessage.contains("fingerprint"))
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, q, 5, codebook = Some(cbA),
        codes = Some(codesA.drop("pq_fp")))
    }
    // the matching pair still works
    assert(Similarity.pqTopK(emb, q, 5, codebook = Some(cbA),
      codes = Some(codesA)).count() > 0)
  }

  test("Sq8CodesStore: build+append matches one-shot quantize; probe parity") {
    val q = emb.filter(col("vec_id") < 8)
    val store = new graft.functions.Sq8CodesStore(tmpDir("sq8store"))
    store.build(emb.filter(col("vec_id") < 250))
    store.append(emb.filter(col("vec_id") >= 250))
    assert(store.codes(spark).collect().toSet ===
      Similarity.sq8Quantize(emb).collect().toSet,
      "appended SQ8 codes diverge from a one-shot quantize")
    assert(Similarity.sq8TopK(emb, q, 5, rerank = 20,
        codes = Some(store.codes(spark))).collect().toSet ===
      Similarity.sq8TopK(emb, q, 5, rerank = 20).collect().toSet,
      "store-backed SQ8 probe diverged from inline")
    val before = store.codes(spark).count()
    store.append(emb.filter(col("vec_id") >= 250)) // replay
    assert(store.codes(spark).count() === before)
    store.consolidate(spark)
    assert(store.codes(spark).collect().toSet ===
      Similarity.sq8Quantize(emb).collect().toSet,
      "SQ8 consolidation changed the codes")
    intercept[IllegalArgumentException] {
      new graft.functions.Sq8CodesStore(tmpDir("sq8none")).append(emb)
    }
  }

  test("codes-store remove ≡ rebuild-without-ids (flat and coarse); " +
    "tombstoned re-append refused until consolidate; then re-admitted") {
    val q = emb.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val dead = emb.filter(col("vec_id") % 7 === 3)
    val kept = emb.filter(col("vec_id") % 7 =!= 3)
    for (cells <- Seq(None, Some(16))) {
      val store = new graft.functions.PqCodesStore(
        tmpDir(s"pqstore-rm-${cells.isDefined}"), m = 8, nCodes = 16,
        nCells = cells)
      store.build(emb.filter(col("vec_id") < 250), Some(cb))
      store.append(emb.filter(col("vec_id") >= 250))
      store.remove(dead.select("vec_id"))
      // the reference: a store built over the kept rows only, under
      // the SAME codebook (and, when coarse, the same frozen seeds is
      // NOT required for this parity — codes carry their own cell, and
      // the removed rows simply never existed)
      def keyOf(r: org.apache.spark.sql.Row) =
        (r.getAs[Any]("cid"), r.getSeq[Int](r.fieldIndex("pq_codes")),
          r.getDouble(r.fieldIndex("pq_norm")))
      val live = store.codes(spark).collect().map(keyOf).toSet
      val rebuilt = Similarity.pqEncode(kept, cb).collect().map(keyOf).toSet
      assert(live === rebuilt,
        s"remove(cells=$cells) diverged from rebuild-without-ids")
      // probe parity against an inline run over the kept corpus
      if (cells.isEmpty)
        assert(Similarity.pqTopK(kept, q, 5, codebook = Some(cb),
            codes = Some(store.codes(spark))).collect().toSet ===
          Similarity.pqTopK(kept, q, 5, codebook = Some(cb))
            .collect().toSet,
          "tombstone-filtered probe diverged from inline over kept rows")
      // a removed id may not be silently re-appended: the dead row is
      // still physically present, so the update-shaped re-add must be
      // refused until consolidate clears it
      val ex = intercept[IllegalArgumentException] {
        store.append(dead.limit(3))
      }
      assert(ex.getMessage.contains("consolidate"))
      store.consolidate(spark)
      assert(store.segmentCount(spark) === 1)
      assert(store.codes(spark).collect().map(keyOf).toSet === rebuilt,
        "consolidate changed the live codes")
      // post-consolidate, the same ids re-admit as a plain append
      store.append(dead)
      assert(store.codes(spark).select("cid").collect()
        .map(_.getLong(0)).toSet ===
        emb.select("vec_id").collect().map(_.getLong(0)).toSet,
        "re-append after consolidate did not restore the removed ids")
    }
    // SQ8: same discipline
    val s8 = new graft.functions.Sq8CodesStore(tmpDir("sq8store-rm"))
    s8.build(emb.filter(col("vec_id") < 250))
    s8.append(emb.filter(col("vec_id") >= 250))
    s8.remove(dead.select("vec_id"))
    assert(s8.codes(spark).collect().toSet ===
      Similarity.sq8Quantize(kept).collect().toSet,
      "SQ8 remove diverged from rebuild-without-ids")
    intercept[IllegalArgumentException] { s8.append(dead.limit(2)) }
    s8.consolidate(spark)
    assert(s8.codes(spark).collect().toSet ===
      Similarity.sq8Quantize(kept).collect().toSet)
    s8.append(dead)
    assert(s8.codes(spark).count() === emb.count())
    // empty removals are a no-op commit (idempotent replay shape)
    s8.remove(emb.filter(col("vec_id") < 0).select("vec_id"))
    assert(s8.codes(spark).count() === emb.count())
  }

  test("codes-store auto-consolidate rides the append commit: a " +
    "threshold-crossing append leaves ONE segment, identical codes") {
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val store = new graft.functions.PqCodesStore(
      tmpDir("pqstore-autocons"), m = 8, nCodes = 16, nCells = Some(16),
      autoConsolidateSegments = 3)
    store.build(emb.filter(col("vec_id") < 100), Some(cb))
    store.append(emb.filter(col("vec_id") >= 100 && col("vec_id") < 200))
    store.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 300))
    assert(store.segmentCount(spark) === 3, "pre-threshold appends " +
      "must accumulate segments up to the budget")
    // tombstones fold out in the same auto-consolidating commit
    store.remove(emb.filter(col("vec_id") === 5L).select("vec_id"))
    store.append(emb.filter(col("vec_id") >= 300))
    assert(store.segmentCount(spark) === 1,
      "threshold-crossing append did not auto-consolidate")
    assert(store.tombstoneIds(spark).isEmpty,
      "auto-consolidate left the folded tombstones in the manifest")
    val quant = Similarity.ivfQuantizeCached(emb, nCells = 16)
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[Any]("cid"), r.getSeq[Int](r.fieldIndex("pq_codes")),
        r.getDouble(r.fieldIndex("pq_norm")))
    assert(store.codes(spark).collect().map(keyOf).toSet ===
      Similarity.pqEncode(emb.filter(col("vec_id") =!= 5L), cb,
        assigned = Some(quant._1.filter(col("cid") =!= 5L)))
        .collect().map(keyOf).toSet,
      "auto-consolidated codes diverged from the expected live set")
    // SQ8 analog
    val s8 = new graft.functions.Sq8CodesStore(
      tmpDir("sq8store-autocons"), autoConsolidateSegments = 2)
    s8.build(emb.filter(col("vec_id") < 200))
    s8.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 300))
    assert(s8.segmentCount(spark) === 2)
    s8.append(emb.filter(col("vec_id") >= 300))
    assert(s8.segmentCount(spark) === 1,
      "SQ8 threshold-crossing append did not auto-consolidate")
    assert(s8.codes(spark).collect().toSet ===
      Similarity.sq8Quantize(emb).collect().toSet)
  }

  test("IVF auto-consolidate rides the append commit: threshold-crossing " +
    "append leaves ONE segment, tombstones folded, probes identical") {
    val dir = tmpDir("ivfautocons")
    val idx = new graft.functions.IvfIndex(dir, nCells = 16,
      autoConsolidateSegments = 2)
    idx.build(emb.filter(col("vec_id") < 200))
    idx.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 300))
    assert(idx.segmentCount(spark) === 2,
      "pre-threshold append must accumulate segments up to the budget")
    // a pending tombstone folds out in the same auto-consolidating turn
    idx.remove(emb.filter(col("vec_id") === 7L).select("vec_id"))
    idx.append(emb.filter(col("vec_id") >= 300))
    assert(idx.segmentCount(spark) === 1,
      "threshold-crossing append did not auto-consolidate")
    assert(idx.tombstoneIds(spark).isEmpty,
      "auto-consolidate left the folded tombstones in the manifest")
    // identical probes vs a never-consolidating index over the same
    // live corpus (vector 7 removed)
    val ref = new graft.functions.IvfIndex(tmpDir("ivfautocons-ref"),
      nCells = 16)
    ref.build(emb.filter(col("vec_id") =!= 7L))
    val q = emb.filter(col("vec_id") < 8)
    val a = idx.topK(spark, q, 5, nProbe = 16)
    val b = ref.topK(spark, q, 5, nProbe = 16)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "auto-consolidated index diverged from the rebuild")
  }

  test("streaming ANN maintenance end-to-end: foreachBatch admission " +
    "feeds live PqCodesStore appends under a concurrent prober; " +
    "mid-stream takedown stops serving the id and re-admits a " +
    "re-crawl; converges to the batch-built store over the admitted " +
    "set; replayed batches are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val admStore = tmpDir("annstream-adm")
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16, iters = 1)
    val pqStore = new graft.functions.PqCodesStore(
      tmpDir("annstream-pq"), m = 8, nCodes = 16,
      retainVersions = 8, autoConsolidateSegments = 2)
    // train-ahead discipline: codebook frozen over the full corpus,
    // store built on the slice already ingested; the stream delivers
    // the rest in micro-batches
    pqStore.build(emb.filter(col("vec_id") < 64), Some(cb))
    val rows = emb.filter(col("vec_id") >= 64)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val chunks = rows.grouped(math.max(1, rows.length / 4)).toSeq
    // plant exact copies of already-admitted vectors under fresh ids:
    // the semantic admission filter must reject them, so they never
    // reach the codes store
    val dupRows = emb.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (10000L + r.getLong(0), r.getSeq[Float](1)))

    def ingest(batch: org.apache.spark.sql.DataFrame): Unit =
      pqStore.append(Similarity.embedNearDupFilterBatch(batch, admStore,
        planes = 12, dims = 64, tables = 8))
    // seed the admission store with the build slice's keys so the
    // stream can't re-admit copies of pre-stream vectors
    Similarity.embedNearDupFilterBatch(
      emb.filter(col("vec_id") < 64).select("vec_id", "embedding"),
      admStore, planes = 12, dims = 64, tables = 8)

    val q8 = emb.filter(col("vec_id") < 8)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          // every probe resolves SOME committed generation — never a
          // torn one — while appends and auto-consolidations land
          val n = Similarity.pqTopK(emb, q8, 5, codebook = Some(cb),
            codes = Some(pqStore.codes(spark))).count()
          assert(n > 0)
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => readerErr.set(t) }
    })
    reader.start()
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir("annstream-ckpt"))
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        ingest(b))
      .start()
    var takedownId = -1L
    try {
      chunks.zipWithIndex.foreach { case (c, i) =>
        input.addData(c.toSeq ++ (if (i == 1) dupRows.toSeq else Nil))
        stream.processAllAvailable()
        if (i == 0) {
          // pick the takedown target from the FIRST stream chunk (so
          // the chunk-1 replay below can't legitimately re-admit it)
          takedownId = pqStore.codes(spark)
            .filter(col("cid") >= 64).agg(min(col("cid")))
            .head().getLong(0)
        }
        if (i == 2) {
          // MID-STREAM TAKEDOWN, the full deletion lifecycle while
          // ingest and the prober keep running: forget the admission
          // keys (a re-crawl of similar content becomes legitimate new
          // data), tombstone the codes row, physically drop it
          assert(Similarity.embedNearDupRemove(
            emb.filter(col("vec_id") === takedownId), admStore,
            planes = 12, dims = 64, tables = 8) > 0L,
            "takedown removed no admission keys")
          pqStore.remove(emb.filter(col("vec_id") === takedownId)
            .select("vec_id"))
          pqStore.consolidate(spark)
          assert(!pqStore.codes(spark).filter(col("cid") === takedownId)
            .head(1).nonEmpty, "takedown target still served")
          // the RE-CRAWL, delivered right behind the takedown (before
          // any later arrival can legitimately occupy the freed
          // buckets): the removed document's exact vector under a
          // fresh id — admission must accept it and the append land it
          input.addData(emb.filter(col("vec_id") === takedownId)
            .select(col("vec_id") + 20000L, col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
          stream.processAllAvailable()
        }
      }
    } finally {
      stream.stop()
      stop.set(true)
      reader.join(60000)
    }
    assert(readerErr.get() === null,
      s"concurrent probe errored: ${readerErr.get()}")
    assert(reads.get() > 0, "reader thread never completed a probe")

    // the planted exact copies were rejected at admission — deletion
    // of redundancy happened BEFORE the expensive encode+commit
    val storedIds = pqStore.codes(spark).select("cid").collect()
      .map(_.getLong(0)).toSet
    assert(!storedIds.exists(id => id >= 10000L && id < 20000L),
      "semantic near-dups leaked into the codes store")
    // deletion lifecycle closed: the taken-down id is gone for good
    // and its re-crawl (same content, fresh id) was re-admitted,
    // encoded, and is served
    assert(!storedIds.contains(takedownId),
      "taken-down id re-appeared in the codes store")
    assert(storedIds.contains(20000L + takedownId),
      "re-crawl of taken-down content was not re-admitted")
    // the build slice is fully present and the stream grew the store;
    // NOT all stream ids land — the synthetic corpus carries planted
    // near-identical vectors, and rejecting those is the admission
    // filter doing its job (the convergence check below proves the
    // store holds exactly the admitted set, whatever it is)
    assert((0L until 64L).forall(storedIds),
      "build-slice vectors missing from the codes store")
    assert(storedIds.size > 64 &&
      rows.map(_._1).count(storedIds) > rows.length / 2,
      s"stream admissions implausibly low: ${storedIds.size - 64} of " +
        s"${rows.length}")
    // maintenance rode the appends: the segment list stayed at the
    // auto-consolidate budget through 4 stream batches
    assert(pqStore.segmentCount(spark) <= 2,
      s"auto-consolidate never ran (${pqStore.segmentCount(spark)} segments)")

    // convergence: the streamed store ≡ a one-shot batch build over
    // exactly the admitted corpus (including the re-crawl row, which
    // lives outside emb), codes and probe results alike
    val corpusPlus = emb.select("vec_id", "embedding").unionByName(
      emb.filter(col("vec_id") === takedownId)
        .select((col("vec_id") + 20000L).as("vec_id"), col("embedding")))
    val admitted = corpusPlus.join(
      pqStore.codes(spark).select(col("cid").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val ref = new graft.functions.PqCodesStore(
      tmpDir("annstream-ref"), m = 8, nCodes = 16)
    ref.build(admitted, Some(cb))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("cid")),
        r.getSeq[Int](r.fieldIndex("pq_codes")),
        r.getDouble(r.fieldIndex("pq_norm")))
    assert(pqStore.codes(spark).collect().map(keyOf).toSet ===
      ref.codes(spark).collect().map(keyOf).toSet,
      "streamed store codes diverge from the batch-built reference")
    assert(Similarity.pqTopK(emb, q8, 5, codebook = Some(cb),
        codes = Some(pqStore.codes(spark))).collect().toSet ===
      Similarity.pqTopK(emb, q8, 5, codebook = Some(cb),
        codes = Some(ref.codes(spark))).collect().toSet,
      "streamed-store probe diverged from the batch-built reference")

    // replay safety (crash between the foreachBatch commit and the
    // checkpoint advance): re-running a delivered batch converges to
    // a no-op — admission reproduces its survivors, append anti-joins
    // them away
    val before = pqStore.codes(spark).collect().map(keyOf).toSet
    ingest(chunks(1).toSeq.toDF("vec_id", "embedding"))
    assert(pqStore.codes(spark).collect().map(keyOf).toSet === before,
      "replayed micro-batch mutated the codes store")
  }

  test("PqCodesStore vacuum reclaims orphans, never committed dirs") {
    val dir = tmpDir("pqstore-vac")
    val cb = Similarity.pqTrainCodebook(emb, m = 8, nCodes = 16)
    val store = new graft.functions.PqCodesStore(dir, m = 8, nCodes = 16)
    store.build(emb, Some(cb))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // plant a crashed writer's orphan segment
    val orphan = new org.apache.hadoop.fs.Path(dir, "seg-orphan01")
    fs.mkdirs(orphan)
    assert(store.vacuum(spark, olderThanMs = 0L) === Seq("seg-orphan01"))
    assert(!fs.exists(orphan))
    // committed dirs survive any horizon
    assert(store.vacuum(spark, olderThanMs = 0L) === Seq.empty)
    assert(store.codes(spark).count() === emb.count())
  }

  test("huge ANN batches stage per-chunk heaps through scratch parquet: " +
    "bounded plan depth, bit-identical results") {
    val q64 = emb.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"), col("label"))
    try {
      spark.conf.set("graft.pq.chunkSize", "4") // 64 queries → 16 chunks
      val unstaged = Similarity.pqTopK(emb, q64, 5).collect().toSet
      spark.conf.set("graft.pq.stageEveryChunks", "4") // → 4 staged groups
      val staged = Similarity.pqTopK(emb, q64, 5).collect().toSet
      assert(staged === unstaged,
        "staged chunk heaps diverged from the union-chain path")
      // a larger synthetic batch (8 shifted copies of 128 queries =
      // 1024 queries, 32 chunks of 32, 8 groups): plan depth stays at
      // the group size however many chunks the batch needs, and the
      // IVF-PQ composition stages identically
      val q1024 = (0 until 8).map(i =>
        emb.filter(col("vec_id") < 128)
          .select((col("vec_id") + lit(10000L * (i + 1))).as("vec_id"),
            col("embedding"))).reduce(_ unionAll _)
      spark.conf.set("graft.pq.chunkSize", "32")
      spark.conf.set("graft.pq.stageEveryChunks", "8")
      val big = Similarity.ivfPqTopK(emb, q1024, 3, nCells = 16,
        nProbe = 4).collect()
      assert(big.map(_.getLong(0)).distinct.length === 1024,
        "staged IVF-PQ lost queries")
      // every shifted copy of a query must rank identically (same
      // vector, ids outside the corpus): staging is content-blind
      val byQuery = big.groupBy(_.getLong(0) % 10000L)
        .view.mapValues(_.map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet).toMap
      assert(byQuery.size === 128 && byQuery.values.forall(_.size === 3),
        "shifted query copies diverged under staging (8 copies of each " +
          "query must produce the identical 3-row heap)")
    } finally {
      spark.conf.unset("graft.pq.chunkSize")
      spark.conf.unset("graft.pq.stageEveryChunks")
    }
  }

  test("streaming embedding admission: SRP store filter drops semantic " +
    "near-dups across batches, replay-idempotent") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val store = tmpDir("embadmspec")
    val b1 = emb.filter(col("vec_id") < 250)
    // batch 2 = the high half PLUS a planted exact copy of vector 0
    // under a fresh id — the semantic duplicate the lexical filters
    // cannot see arriving later in the stream
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding"), col("label")).head()
    val planted = spark.createDataFrame(
      java.util.Arrays.asList(Row(90001L, v0.get(0), v0.get(1))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", emb.schema("embedding").dataType),
        StructField("label", emb.schema("label").dataType))))
    val b2 = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(planted)
    val s1 = Similarity.embedNearDupFilterBatch(b1, store,
      planes = 12, dims = 64, tables = 8)
    assert(s1.filter(col("vec_id") === 0).count() === 1L,
      "vector 0 should be admitted in batch 1")
    val s2 = Similarity.embedNearDupFilterBatch(b2, store,
      planes = 12, dims = 64, tables = 8)
    assert(s2.filter(col("vec_id") === 90001L).count() === 0L,
      "the planted copy of an admitted vector must be rejected")
    assert(s2.count() > 0, "batch 2 over-dropped: nothing admitted")
    // replay (crash between store append and sink write): identical
    // survivor set — the store join excludes a doc's own keys
    val s2r = Similarity.embedNearDupFilterBatch(b2, store,
      planes = 12, dims = 64, tables = 8)
    assert(s2r.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq,
      "replayed batch diverged from the original survivor set")
  }

  test("SRP admission store survives a rebucket migration: semantic " +
    "decisions identical at the new modulus") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val store = tmpDir("embadmreb")
    Similarity.embedNearDupFilterBatch(emb.filter(col("vec_id") < 250),
      store, planes = 12, dims = 64, tables = 8, nBuckets = 16,
      tailFoldFiles = 0)
    assert(graft.functions.Dedup.rebucketAdmitted(spark, store, 64) > 0L)
    // the planted exact copy of an admitted vector must still be
    // rejected through the migrated layout; the high half admits
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding"), col("label")).head()
    val planted = spark.createDataFrame(
      java.util.Arrays.asList(Row(90002L, v0.get(0), v0.get(1))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", emb.schema("embedding").dataType),
        StructField("label", emb.schema("label").dataType))))
    val s2 = Similarity.embedNearDupFilterBatch(
      emb.filter(col("vec_id") >= 250)
        .select(col("vec_id"), col("embedding"), col("label"))
        .unionByName(planted),
      store, planes = 12, dims = 64, tables = 8, nBuckets = 64)
    assert(s2.filter(col("vec_id") === 90002L).count() === 0L,
      "planted copy admitted after the migration — keys lost")
    assert(s2.count() > 0, "post-migration batch over-dropped")
  }

  test("SRP admission-store removal: takedown frees future admission; " +
    "content-keyed and full-sweep paths agree") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding"), col("label")).head()
    def copyOf(id: Long) = spark.createDataFrame(
      java.util.Arrays.asList(Row(id, v0.get(0), v0.get(1))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", emb.schema("embedding").dataType),
        StructField("label", emb.schema("label").dataType))))
    val b1 = emb.filter(col("vec_id") < 250)

    // content-keyed removal: prunes to the touched buckets
    val store = tmpDir("embadmrm")
    Similarity.embedNearDupFilterBatch(b1, store,
      planes = 12, dims = 64, tables = 8).collect()
    assert(Similarity.embedNearDupFilterBatch(copyOf(90001L), store,
      planes = 12, dims = 64, tables = 8).count() === 0L,
      "pre-removal: the copy of admitted vector 0 must be rejected")
    val removed = Similarity.embedNearDupRemove(
      emb.filter(col("vec_id") === 0), store, planes = 12, dims = 64,
      tables = 8)
    assert(removed > 0L, "takedown removed no rows")
    assert(Similarity.embedNearDupFilterBatch(copyOf(90002L), store,
      planes = 12, dims = 64, tables = 8).count() === 1L,
      "post-removal: the copy must be admitted (store forgot vector 0)")
    // unrelated vectors' keys survived the bucket rewrites
    val v7 = emb.filter(col("vec_id") === 7)
      .select(col("embedding"), col("label")).head()
    val copy7 = spark.createDataFrame(
      java.util.Arrays.asList(Row(90003L, v7.get(0), v7.get(1))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", emb.schema("embedding").dataType),
        StructField("label", emb.schema("label").dataType))))
    assert(Similarity.embedNearDupFilterBatch(copy7, store,
      planes = 12, dims = 64, tables = 8).count() === 0L,
      "removal lost an unrelated vector's keys")

    // full-sweep removal by id reaches the same admission state
    val store2 = tmpDir("embadmrm2")
    Similarity.embedNearDupFilterBatch(b1, store2,
      planes = 12, dims = 64, tables = 8).collect()
    assert(graft.functions.Dedup.removeAdmittedIds(spark, store2,
      Set(0L)) === removed, "full sweep removed a different row count")
    assert(Similarity.embedNearDupFilterBatch(copyOf(90002L), store2,
      planes = 12, dims = 64, tables = 8).count() === 1L,
      "full-sweep removal did not free admission")
    // sweep on a missing store is a safe no-op
    assert(graft.functions.Dedup.removeAdmittedIds(spark,
      tmpDir("embadmrm3") + "/absent", Set(1L)) === 0L)

    // the distributed-id-relation overload (large decontamination
    // lists) removes the same rows as the Set overload
    val store3 = tmpDir("embadmrm4")
    Similarity.embedNearDupFilterBatch(b1, store3,
      planes = 12, dims = 64, tables = 8).collect()
    assert(graft.functions.Dedup.removeAdmittedIds(spark, store3,
      emb.filter(col("vec_id") === 0).select("vec_id")) === removed,
      "DataFrame-overload sweep removed a different row count")
    assert(Similarity.embedNearDupFilterBatch(copyOf(90002L), store3,
      planes = 12, dims = 64, tables = 8).count() === 1L,
      "DataFrame-overload removal did not free admission")
  }

  test("crossEmbeddingNearDupPairs ≡ the cross-parity subset of the " +
    "self-join family, scores identical") {
    val cross = Similarity.crossEmbeddingNearDupPairs(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        0.4, planes = 4, dims = 64, tables = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(cross.nonEmpty, "no cross-corpus pairs at the spec corpus")
    cross.foreach { case ((a, b), _) =>
      assert(a % 2 == 0 && b % 2 == 1, s"within-side pair leaked: ($a,$b)") }
    // the bipartite join must find EXACTLY the self-join's mixed-parity
    // pairs (bucket membership is side-independent), same scores
    val full = Similarity.embeddingNearDupPairs(emb, 0.4,
        planes = 4, dims = 64, tables = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .filter { case ((a, b), _) => a % 2 != b % 2 }
      .map { case ((a, b), s) =>
        (if (a % 2 == 0) (a, b) else (b, a), s) }.toMap
    assert(cross.toMap === full,
      "bipartite pairs diverge from the self-join's cross-parity subset")
    // durable SRP bucket index ≡ the inline path
    val durable = Similarity.crossEmbeddingNearDupPairs(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        0.4, planes = 4, dims = 64, tables = 8,
        indexPath = Some(tmpDir("crossemb-index")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(durable.toMap === cross.toMap,
      "durable SRP bucket index diverged from the inline path")
  }

  test("PQ is deterministic across invocations and rejects bad configs") {
    val q = emb.filter(col("vec_id") < 8)
    val a = Similarity.pqTopK(emb, q, 5).collect().toSet
    val b = Similarity.pqTopK(emb, q, 5).collect().toSet
    assert(a === b, "PQ diverged across two identical invocations")
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, q, 5, m = 5) // 64 % 5 != 0
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 0), 5) // empty batch
    }
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, q, 5, rerank = 3) // rerank < k
    }
  }
}
