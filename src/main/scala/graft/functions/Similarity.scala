package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a large-scale ANN pipeline needs both:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. The query side is broadcast, so the corpus is scanned
  *    exactly once with no shuffle of embeddings; per-corpus-partition
  *    top-k would be the next refinement (TakeOrderedAndProject
  *    already avoids a global sort).
  *  - [[lshBucketedTopK]]: sign-random-projection LSH — corpus and
  *    queries are hashed into buckets scan-side, candidates come from
  *    bucket equi-joins (shuffle carries only (bucket, id, vec)), and
  *    exact cosine re-ranks candidates. This is the 100 TB path: cost
  *    scales with bucket collision counts, not corpus × queries.
  *
  * All arithmetic uses higher-order array functions on doubles —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two array<float/double> columns as double, with a
    * deterministic left-to-right accumulation order (stable across
    * engines for oracle comparison).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm via the native codegen dot (one fused loop) — this runs
    * per corpus row in `embed_norms` and the SQ8 quantize pass, so it
    * gets the hot-path implementation; the self-dot accumulates left
    * to right exactly like the HOF fold, so values are bit-identical.
    */
  def norm(a: Column): Column =
    sqrt(graft.plans.DotProductExpr.dot_product(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖) — higher-order-function
    * reference formulation (interpreted; three array passes), kept
    * fully HOF as the independent implementation the native
    * expression's bit-parity tests compare against.
    * try_divide: zero-norm inputs yield NULL rather than an ANSI
    * divide-by-zero error (Spark 4 default) or NaN — NULLs drop out
    * of rankings instead of sorting above every real score.
    */
  def cosineHof(a: Column, b: Column): Column =
    try_divide(dot(a, b), sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine similarity via the native codegen'd expression
    * ([[graft.plans.CosineSimilarityExpr]]): one fused loop inside
    * whole-stage codegen, bit-identical results to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarityExpr.cosine_sim(a, b)

  /** Exact cosine top-k neighbors for each query vector.
    * `queries` must be small (it is broadcast); returns
    * (query_id, rank, neighbor_id) with rank 1..k by descending
    * cosine, neighbor id as tie-break, self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("score", cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    // per-key top-k via the custom bounded-heap operator — no
    // per-partition sort (see graft.plans.TopKPerKey)
    graft.plans.TopKPerKey(scored, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.desc("score"),
        graft.plans.TopKPerKey.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
  }

  /** Sign-random-projection bucket key: `planes` pseudo-random
    * Rademacher (±1) hyperplanes derived from [[Hashing.hash60]] of
    * (plane, dim) — fully deterministic and reproducible in SQL. The
    * bucket is the concatenated sign bits of the projections.
    */
  def srpBucket(vec: Column, planes: Int, dims: Int,
                tableSalt: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      // projection_p(v) = Σ_d v[d] * sign(hash(table, p, d))
      val proj = aggregate(
        zip_with(vec, srpSigns(tableSalt, p, dims),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bits: _*)
  }

  /** All `tables` SRP buckets of a vector in ONE pass via the fused
    * native expression ([[graft.plans.SrpBucketsExpr]]) — bit-identical
    * bits to `tables` [[srpBucket]] calls, but a single vector
    * traversal and constant-size generated code (32 separate per-plane
    * folds overflow the JIT method limit and run interpreted).
    * Returns array<string> indexed by table.
    */
  def srpBuckets(vec: Column, planes: Int, dims: Int,
                 tables: Int): Column = {
    val flat = array((for {
      t <- 0 until tables; p <- 0 until planes; d <- 0 until dims
    } yield lit(srpSign(t, p, d))): _*)
    graft.plans.SrpBucketsExpr.srp_buckets(vec, flat, tables, planes)
  }

  /** The deterministic ±1 of hyperplane (table `t`, plane `p`,
    * dimension `d`): parity of the md5 of "t:p:d". Public so the
    * DuckDB oracle SQL can be generated from the SAME constants the
    * Spark plan folds in — the bucket assignment is then reproducible
    * in any engine from the integers alone.
    */
  def srpSign(t: Int, p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$t:$p:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** The ±1 pattern of plane `p` in table `t` as a constant array
    * column — evaluated once by constant folding, broadcast implicitly
    * in the plan (never a data-dependent lookup).
    */
  private def srpSigns(t: Int, p: Int, dims: Int): Column =
    array((0 until dims).map(d => lit(srpSign(t, p, d))): _*)

  /** IVF (inverted-file) approximate top-k — the other standard ANN
    * scale path: a coarse quantizer of `nCells` centroids partitions
    * the corpus into cells; queries probe only the `nProbe` nearest
    * cells and re-rank candidates exactly.
    *
    * The quantizer here is one deterministic k-means step (seeds =
    * first `nCells` vectors, one assignment, per-cell mean). All
    * steps are DataFrame ops — centroids stay distributed and are
    * broadcast by size, never collected. At scale the cell assignment
    * is a write-once index (persist `assigned`); each query then
    * touches ~nProbe/nCells of the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int, nProbe: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val (assigned, centroids) = ivfQuantize(corpus, nCells, idCol, vecCol)
    ivfProbe(assigned, centroids, queries, k, nProbe, idCol, vecCol)
  }

  /** One deterministic k-means step: seed cells = first `nCells`
    * vectors by id, one cosine assignment, per-cell per-dim mean.
    * Returns (assigned = (cid, cell, cv), centroids = (cell,
    * centroid)). Shared by the per-call [[ivfTopK]] and the persisted
    * [[IvfIndex]].
    */
  /** Nearest-seed cell assignment for `(cid, cv)` rows. Assignment
    * key = the 6-dp ROUNDED cosine with the cell id as an explicit
    * tiebreak (max over a (sim, cell) struct is lexicographic in both
    * Spark and DuckDB): full-precision max_by would make near-ties
    * engine-dependent (two engines folding the same doubles in
    * different orders disagree in the last ulp) and exact ties
    * nondeterministic even within Spark. Shared by the one-shot
    * quantizer and [[IvfIndex.append]], so incremental additions land
    * in exactly the cell a full rebuild over the same seeds would
    * pick.
    */
  private[functions] def assignToSeeds(c: DataFrame,
      seeds: DataFrame): DataFrame =
    c.join(seeds)
      .withColumn("sim", Hashing.portableRound(cosine(col("cv"), col("seed")), 6))
      .groupBy(col("cid"))
      .agg(max(struct(col("sim"), col("cell"))).getField("cell").as("cell"))
      .join(c, "cid")

  /** Quantizer seeds: the first nCells vectors by id — id-agnostic
    * (an id-value predicate like `id < nCells` silently selects
    * nothing for non-zero-based id spaces) and deterministic (a bare
    * limit() is not).
    */
  private[functions] def ivfSeeds(corpus: DataFrame, nCells: Int,
      idCol: String, vecCol: String): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("seed"))

  private[functions] def ivfQuantize(corpus: DataFrame, nCells: Int,
      idCol: String, vecCol: String): (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val seeds = broadcast(ivfSeeds(corpus, nCells, idCol, vecCol))
    val assigned = assignToSeeds(c, seeds)
    // Caveat: AVG over doubles is summation-order-dependent (Spark
    // partial-aggregates per partition; a sequential engine folds left
    // to right), so centroid values can differ across engines in the
    // last ulp. Downstream comparisons against centroids therefore go
    // through the same 6-dp rounding as the assignment above, which
    // absorbs that noise except on astronomically unlikely exact
    // rounding-boundary hits.
    val centroids = assigned
      .select(col("cell"), posexplode(col("cv")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("v")).as("cval"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cval")))),
        s => s.getField("cval")).as("centroid"))
    (assigned, centroids)
  }

  /** Probe + exact re-rank against an (assigned, centroids) pair —
    * in-memory or read back from a persisted [[IvfIndex]].
    */
  private[functions] def ivfProbe(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // rounded probe key for the same cross-engine robustness as the
    // assignment step (cell id already breaks rounded ties)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", Hashing.portableRound(cosine(col("qv"), col("centroid")), 6))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val cand = assigned.join(probes, Seq("cell"))
      .filter(col("cid") =!= col("query_id"))
      .withColumnRenamed("cid", "neighbor_id")
      // portableRound, not round: the 6-dp score is both the output
      // and the rank key, and portableRound is the form DuckDB's
      // ROUND reproduces bit-for-bit (see Hashing.portableRound)
      .withColumn("score", Hashing.portableRound(cosine(col("qv"), col("cv")), 6))
      .select(col("query_id"), col("neighbor_id"), col("score"))
    graft.plans.TopKPerKey(cand, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.desc("score"),
        graft.plans.TopKPerKey.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("score"))
  }

  /** Embedding-space near-duplicate PAIRS (the dedup-by-embedding
    * modality): SRP-bucket candidate generation — a pair qualifies if
    * it shares a bucket in ANY of the `tables` hash tables — followed
    * by exact cosine verification at `threshold` on the 6-dp-rounded
    * score.
    *
    * Order of operations is DISTINCT-first: the bucket self-join
    * carries bare (tbl, bucket, id) rows, candidate pairs are
    * deduplicated on ids alone (a pair colliding in several tables is
    * scored once, not per collision), and the two gather joins fetch
    * vectors only for unique pairs. Measured 2.1× the score-first
    * spelling at sf0.1 — and no vector ever rides the candidate
    * shuffle. At scale the gathers are plain shuffle joins of the
    * deduped pair list against the corpus (sketch → bucket → verify,
    * with verify last and minimal).
    *
    * Bucket granularity is the scale knob: 2^planes buckets per
    * table, so choose planes ≈ log₂(corpus / target-bucket-size) to
    * keep per-bucket pair fan-out bounded as the corpus grows. Hot
    * buckets from genuinely DENSE REGIONS are signal — the right
    * response there is finer buckets (more planes), not dropping.
    * But a large cluster of IDENTICAL vectors (exact-dup documents
    * re-embedded) collides in every table no matter how many planes,
    * emitting m²/2 pairs: `maxBucketSize` drops such degenerate
    * buckets with a logged count (default ∞ = bit-identical to the
    * unguarded join; the production order runs exact dedup first so
    * the guard never fires on real clusters).
    * Returns (vec_a, vec_b, score) with vec_a < vec_b.
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double,
                            planes: Int, dims: Int, tables: Int = 8,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            maxBucketSize: Long = Long.MaxValue): DataFrame = {
    val b0 = corpus.select(col(idCol).as("id"),
      posexplode(srpBuckets(col(vecCol), planes, dims, tables))
        .as(Seq("tbl", "b")))
    val b = Dedup.dropOversizedBuckets(b0, Seq("tbl", "b"), maxBucketSize,
      "embeddingNearDupPairs")
    val pairs = b.as("l").join(b.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.b") === col("r.b") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("vec_a"), col("r.id").as("vec_b"))
      .distinct()
    val v = corpus.select(col(idCol), col(vecCol))
    pairs
      .join(v.select(col(idCol).as("vec_a"), col(vecCol).as("va")), "vec_a")
      .join(v.select(col(idCol).as("vec_b"), col(vecCol).as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        Hashing.portableRound(cosine(col("va"), col("vb")), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the coarse quantizer,
    * then inside each cluster mark as duplicates the vectors that sit
    * within cosine `threshold` of another cluster member. This prunes
    * semantically redundant training documents that no lexical sketch
    * (minhash/simhash) can see — paraphrases, re-renders, translations
    * embedded near each other.
    *
    * Duplicate rule (deterministic, engine-portable): a vector is a
    * duplicate iff SOME lower-id vector in the same cell has 6-dp
    * rounded cosine ≥ threshold — the same min-id-survivor convention
    * as exact dedup, independent of visit order (NOT the chained
    * "survivor set" variant, whose result depends on iteration order).
    *
    * Scale shape: the quadratic term is confined within cells — this
    * is the point of SemDeDup's clustering step. Choose nCells ≈
    * corpus / target-cell-size to bound per-cell fan-out;
    * `maxCellSize` guards the degenerate case (a mega-cluster of
    * identical vectors) by dropping oversized cells with a logged
    * count, exactly like the LSH band-join guard.
    *
    * Returns (idCol, cell, is_duplicate).
    */
  def semDedup(corpus: DataFrame, nCells: Int, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding",
               maxCellSize: Long = Long.MaxValue): DataFrame = {
    val (assigned, _) = ivfQuantize(corpus, nCells, idCol, vecCol)
    // The assignment feeds three consumers (both self-join sides and
    // the verdict's left join); without materialization Spark would
    // recompute the scan + seed cross-join + argmax three times.
    // localCheckpoint suits this sandbox; the 100 TB deployment
    // persists the assignment once via IvfIndex and runs semDedup
    // over the stored (cid, cell, cv) table instead.
    val guarded = Dedup.dropOversizedBuckets(
      assigned, Seq("cell"), maxCellSize, "semDedup")
      .localCheckpoint(true)
    // pair shuffle carries (cell) keyed rows with the vector payload —
    // within-cell only, never corpus × corpus
    val dominated = guarded.as("l").join(guarded.as("r"),
        col("l.cell") === col("r.cell") && col("l.cid") < col("r.cid"))
      .filter(
        Hashing.portableRound(cosine(col("l.cv"), col("r.cv")), 6)
          >= threshold)
      .select(col("r.cid").as("cid")).distinct()
    guarded.select(col("cid"), col("cell"))
      .join(dominated.withColumn("dup", lit(true)), Seq("cid"), "left")
      .select(col("cid").as(idCol), col("cell"),
        coalesce(col("dup"), lit(false)).as("is_duplicate"))
  }

  /** Multi-table LSH approximate top-k: `tables` independent SRP hash
    * tables of `planes` sign bits each; a corpus vector is a candidate
    * for a query if they share a bucket in ANY table (the standard
    * recall amplifier: miss probability decays exponentially in the
    * table count). Exact cosine re-ranks the deduplicated candidates.
    * Returns (query_id, rank, neighbor_id, score rounded 6dp).
    *
    * Scale shape: each side is scanned once, emitting `tables` rows
    * per vector keyed by a small bucket string; the join shuffles
    * (bucket, id) pairs only, and the re-rank runs on candidates —
    * never corpus × queries.
    */
  def lshBucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      planes: Int, dims: Int, tables: Int = 8,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(srpBuckets(col(vecCol), planes, dims, tables))
            .as(Seq("tbl", "b")))
        .select(col(id), col(vec),
          concat_ws("|", col("tbl"), col("b")).as("bucket"))
    val bucketed = withBuckets(corpus, "neighbor_id", "cv")
    val qb = broadcast(withBuckets(queries, "query_id", "qv"))
    // score BEFORE deduplicating: duplicate candidates (same pair from
    // several tables) recompute a cheap fused-loop cosine, but the
    // dedup shuffle then carries (ids, score) — ~24 bytes — instead of
    // two embedding vectors per row
    val cand = bucketed.join(qb, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", Hashing.portableRound(cosine(col("qv"), col("cv")), 6))
      .select("query_id", "neighbor_id", "score")
      .dropDuplicates("query_id", "neighbor_id")
    graft.plans.TopKPerKey(cand, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.desc("score"),
        graft.plans.TopKPerKey.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("score"))
  }

  /** SQ8 scalar quantization (FAISS `SQ8`-style): each vector
    * compresses to 1-byte codes plus one double scale —
    * `scale = max|x|/127`, `code = floor(x/scale + 0.5)` ∈ [-127,127]
    * (tinyint; the floor-half-up formula is engine-portable, and a
    * zero vector takes scale 1 so codes stay defined). At 100 TB of
    * embeddings this is the memory-bandwidth play: a candidate scan
    * reads ~1/4 the bytes of float32 (64 B codes vs 256 B floats for
    * 64 dims), and the codes table is the write-once artifact the
    * [[IvfIndex]]/`indexPath` pattern would persist.
    *
    * Returns (idCol, sq_codes array<tinyint>, sq_scale, sq_norm) —
    * `sq_norm` is the EXACT float-vector L2 norm, kept beside the
    * codes so approximate cosine needs no second pass over the
    * originals.
    */
  def sq8Quantize(df: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val absmax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol), col(vecCol),
        when(absmax === 0.0, lit(1.0)).otherwise(absmax / 127.0)
          .as("sq_scale"))
      .select(col(idCol),
        transform(col(vecCol), x =>
          floor(x.cast("double") / col("sq_scale") + lit(0.5))
            .cast("byte")).as("sq_codes"),
        col("sq_scale"),
        norm(col(vecCol)).as("sq_norm"))
  }

  /** SQ8 approximate top-k with exact re-rank — the third standard ANN
    * path beside SRP-LSH (collision-bounded) and IVF (partition-
    * pruned): scan the 1-byte codes, rank by approximate cosine
    * `dot(codes)·sa·sb / (na·nb)`, keep `rerank ≥ k` candidates per
    * query, then re-rank ONLY that short list with exact cosine over
    * the full vectors.
    *
    * Determinism across engines is structural: the code dot product
    * is integer arithmetic carried exactly in doubles (≤ 127²·dims ≪
    * 2⁵³), so the approximate ranking — the recall-critical step —
    * has no float-summation ambiguity at all; the scale/norm factors
    * multiply in a fixed order and round to 6 dp before ranking (ids
    * break ties). The candidate shuffle carries (ids, score) only;
    * vectors re-enter via broadcast joins of the rerank·|queries|
    * short list against the corpus — the corpus itself never shuffles.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              rerank: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding",
              codesPath: Option[String] = None): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    // codesPath = the write-once durable-artifact configuration (the
    // jaccard indexPath / IvfIndex / LangModel.modelPath pattern):
    // quantize ONCE, persist, and every later query batch scans the
    // 1-byte codes table instead of re-deriving it from the float
    // corpus — this is where the 4× bandwidth saving actually lands.
    // Validity = parquet's own _SUCCESS commit marker; a torn build
    // has no marker and is rebuilt with overwrite.
    val quantized = codesPath match {
      case Some(p) =>
        val spark = corpus.sparkSession
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
          sq8Quantize(corpus, idCol, vecCol)
            .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => sq8Quantize(corpus, idCol, vecCol)
    }
    val c = quantized
      .select(col(idCol).as("neighbor_id"), col("sq_codes").as("cc"),
        col("sq_scale").as("cs"), col("sq_norm").as("cn"))
    val q = broadcast(sq8Quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("sq_codes").as("qc"),
        col("sq_scale").as("qs"), col("sq_norm").as("qn")))
    val approx = c.join(q, col("neighbor_id") =!= col("query_id"))
      // the native codegen dot (one fused loop in WSCG), not the
      // interpreted zip_with/aggregate HOF: this expression runs
      // n×|queries| times — the hottest loop in the operator. The
      // tinyint→double cast is itself codegen'd and the values are
      // exact integers either way, so the score is bit-identical.
      .withColumn("ascore", Hashing.portableRound(
        try_divide(graft.plans.DotProductExpr.dot_product(
            col("qc").cast("array<double>"), col("cc").cast("array<double>"))
          * col("qs") * col("cs"),
          col("qn") * col("cn")), 6))
      // zero-norm vectors have NO cosine: drop the NULL try_divide
      // rows here, or a short candidate list (fewer real candidates
      // than k) would surface them as NULL-scored "neighbors"
      .filter(col("ascore").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("ascore"))
    val cand = graft.plans.TopKPerKey(approx, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.desc("ascore"),
        graft.plans.TopKPerKey.asc("neighbor_id")), rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank of the short list: candidates are rerank·|queries|
    // rows — broadcast them into the corpus scan, never the reverse
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val exact = cv.join(broadcast(cand), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("score",
        Hashing.portableRound(cosine(col("qv"), col("cv")), 6))
      .filter(col("score").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("score"))
    graft.plans.TopKPerKey(exact, Seq("query_id"),
      Seq(graft.plans.TopKPerKey.desc("score"),
        graft.plans.TopKPerKey.asc("neighbor_id")), k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("score"))
  }
}

/** Persisted IVF index — the write-once scale path [[Similarity.ivfTopK]]'s
  * scaladoc promises: quantize the corpus ONCE, then every query batch
  * probes the stored index instead of rebuilding the quantizer.
  *
  * Layout at `path`:
  *  - `centroids/`: (cell, centroid array<double>) — nCells rows,
  *    broadcast at query time;
  *  - `assigned/`: (cid, cv) parquet PARTITIONED BY cell — a probe
  *    reads only its nProbe cell directories, so per-batch corpus I/O
  *    is ~nProbe/nCells of the table (partition-pruned scan, visible
  *    as PartitionFilters in the plan), not a full scan.
  *
  * Probed cells are collected to the driver to prune statically —
  * bounded by nCells rows (same pattern as the upsert sink's touched
  * partitions), never data-sized.
  */
class IvfIndex(path: String, nCells: Int,
               idCol: String = "vec_id", vecCol: String = "embedding") {
  import Similarity.{ivfQuantize, ivfProbe, ivfSeeds, assignToSeeds}

  private def hfs(spark: SparkSession) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def p(sub: String) = new org.apache.hadoop.fs.Path(s"$path/$sub")

  def build(corpus: DataFrame): Unit = {
    val (assigned, centroids) = ivfQuantize(corpus, nCells, idCol, vecCol)
    // Crash protocol: invalidate FIRST (drop centroids — the `exists`
    // marker), then write assigned, then centroids last. A crash at
    // any point leaves either the old intact index or a not-yet-
    // existing one (rebuilt on the next call) — never a mix of
    // generations served as valid.
    val spark = corpus.sparkSession
    val fs = hfs(spark)
    fs.delete(p("centroids"), true)
    fs.delete(p("centroids_prev"), true) // torn append leftover
    // Delete assigned/ explicitly rather than trusting mode("overwrite"):
    // under spark.sql.sources.partitionOverwriteMode=dynamic (a session
    // setting callers may have on), a partitioned overwrite only
    // replaces partitions present in THIS build — stale cell
    // directories from a previous generation would survive and the
    // final centroids write would mark the mixed-generation index
    // valid.
    fs.delete(p("assigned"), true)
    fs.delete(p("seeds"), true)
    // tombstones belong to the PREVIOUS generation: left behind, they
    // would silently filter legitimately-rebuilt ids out of topK
    fs.delete(p("tombstones"), true)
    fs.delete(p("assigned_stage"), true) // torn compact leftover
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    // persist the quantizer seeds so append() assigns against the
    // SAME frozen quantizer a rebuild over these seeds would use
    ivfSeeds(corpus, nCells, idCol, vecCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/seeds")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incrementally add vectors to an existing index without a
    * rebuild — the FAISS-style IVF maintenance mode: the quantizer is
    * FROZEN after build (assignments use the persisted seeds with the
    * exact [[Similarity.assignToSeeds]] arithmetic, so each added
    * vector lands in the cell a full rebuild over the same seeds
    * would pick) and cell CENTROIDS are left as built — probe
    * rankings drift as cells grow, which is the documented trade-off;
    * rebuild (or re-`build`) periodically to re-center, exactly as
    * IVF deployments retrain.
    *
    * Crash protocol mirrors build's invalidate-first rule without
    * rewriting data: rename centroids → centroids_prev (index now
    * invalid), append the new assignments, rename back (valid again).
    * A crash mid-append leaves no centroids marker, so the next
    * `build` starts clean — a torn append is never served.
    */
  def append(newVectors: DataFrame): Unit = {
    val spark = newVectors.sparkSession
    require(exists(spark), s"no index at $path to append to — call build()")
    val fs = hfs(spark)
    val seeds = broadcast(spark.read.parquet(s"$path/seeds"))
    val assigned = assignToSeeds(
      newVectors.select(col(idCol).as("cid"), col(vecCol).as("cv")), seeds)
    // Re-adding a tombstoned id is an UPDATE, not an append: the dead
    // row is still physically present (possibly in a different cell if
    // the vector changed), so clearing its tombstone would resurrect
    // it beside the new row as a duplicate. Require compact() first —
    // it physically clears the dead rows, making the re-add a plain
    // append.
    tombstones(spark).foreach { t =>
      val clash = assigned.join(broadcast(t), Seq("cid"), "left_semi")
        .limit(1).count()
      require(clash == 0L,
        s"append includes tombstoned id(s) — run compact() on $path first")
    }
    // Idempotence under retries: a re-delivered batch must not land
    // twice (topK would then return the same id multiple times). The
    // quantizer is frozen, so a replayed id re-assigns to the SAME
    // cell it already occupies — anti-joining against the ids present
    // in just the batch's target cells (a partition-pruned, id-only
    // scan, bounded by the batch's own cell set) filters replays
    // without a full-index scan. Materialize (persist + count) BEFORE
    // invalidating, so the index is never read while being appended to.
    val targetCells: Seq[Any] = assigned.select("cell").distinct()
      .collect().map(_.get(0)).toSeq // ≤ nCells rows — never data-sized
    val raw = spark.read.parquet(s"$path/assigned")
    val existing = raw
      .filter(col("cell").isInCollection(targetCells.map(cellToNative(raw))))
      .select(col("cid"))
    val fresh = assigned.join(existing, Seq("cid"), "left_anti").persist()
    try {
      if (fresh.count() > 0) {
        require(fs.rename(p("centroids"), p("centroids_prev")),
          s"could not invalidate $path for append")
        fresh.write.mode("append").partitionBy("cell")
          .parquet(s"$path/assigned")
        require(fs.rename(p("centroids_prev"), p("centroids")),
          s"could not re-validate $path after append")
      }
    } finally fresh.unpersist()
  }

  /** Pending removals as a 1-column (`cid`) relation, if any. Kept
    * deliberately small: tombstones accumulate between compactions
    * only, and every consumer broadcasts them.
    */
  private def tombstones(spark: SparkSession): Option[DataFrame] =
    if (hfs(spark).exists(p("tombstones")))
      Some(spark.read.parquet(s"$path/tombstones"))
    else None

  /** Logically delete vectors: append their ids to the tombstone set.
    * O(|ids|) — no data file is touched; `topK` anti-joins the
    * (broadcast) tombstones until [[compact]] rewrites the affected
    * cells. Idempotent: re-removing an id adds a duplicate tombstone
    * row with identical anti-join semantics, deduped at compaction.
    * Crash protocol is append's: the index is invalid (centroids
    * renamed away) for the duration of the tombstone write.
    */
  def remove(ids: DataFrame): Unit = {
    val spark = ids.sparkSession
    require(exists(spark), s"no index at $path to remove from — call build()")
    val fs = hfs(spark)
    val tomb = ids.select(col(idCol).as("cid")).distinct().persist()
    try {
      if (tomb.count() > 0) {
        require(fs.rename(p("centroids"), p("centroids_prev")),
          s"could not invalidate $path for remove")
        tomb.coalesce(1).write.mode("append").parquet(s"$path/tombstones")
        require(fs.rename(p("centroids_prev"), p("centroids")),
          s"could not re-validate $path after remove")
      }
    } finally tomb.unpersist()
  }

  /** Physically apply pending tombstones: rewrite ONLY the cell
    * partitions that contain dead rows (found via a column-pruned
    * (cid, cell) scan against the broadcast tombstone set), then drop
    * the tombstone set. Cells without deletions keep their files —
    * compaction cost scales with the touched-cell fraction, not the
    * index. The rewrite stages cleaned partitions beside the index and
    * swaps them in per cell dir; a crash anywhere inside the
    * invalidated window leaves no centroids marker, so a torn compact
    * is never served (next `build` starts clean).
    */
  def compact(spark: SparkSession): Unit = {
    require(exists(spark), s"no index at $path to compact — call build()")
    val fs = hfs(spark)
    tombstones(spark).foreach { t0 =>
      val t = broadcast(t0.distinct())
      val raw = spark.read.parquet(s"$path/assigned")
      // values come straight from raw's own partition column, so they
      // are already the inferred native type — cast-free pruning
      val touched: Seq[Any] = raw.join(t, Seq("cid"), "left_semi")
        .select(col("cell")).distinct().collect().map(_.get(0)).toSeq
      if (touched.nonEmpty) {
        val cleaned = raw.filter(col("cell").isInCollection(touched))
          .join(t, Seq("cid"), "left_anti")
        require(fs.rename(p("centroids"), p("centroids_prev")),
          s"could not invalidate $path for compact")
        fs.delete(p("assigned_stage"), true)
        cleaned.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$path/assigned_stage")
        touched.foreach { c =>
          val dir = s"cell=$c"
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/assigned/$dir"), true)
          val staged = new org.apache.hadoop.fs.Path(s"$path/assigned_stage/$dir")
          // a cell whose every row died has no staged output — the
          // delete above already emptied it
          if (fs.exists(staged))
            require(fs.rename(staged,
                new org.apache.hadoop.fs.Path(s"$path/assigned/$dir")),
              s"could not swap compacted cell $c into $path")
        }
        fs.delete(p("assigned_stage"), true)
        fs.delete(p("tombstones"), true)
        require(fs.rename(p("centroids_prev"), p("centroids")),
          s"could not re-validate $path after compact")
      } else fs.delete(p("tombstones"), true) // nothing physical to do
    }
  }

  /** Partition-value type inference may narrow `cell` on read-back
    * (e.g. a long id column comes back int); coerce in-memory cell
    * values to the INFERRED type so filters compare cast-free and
    * prune partitions. Cell ids inherit idCol's type — no Long
    * assumption.
    */
  private def cellToNative(raw: DataFrame): Any => Any =
    raw.schema("cell").dataType match {
      case IntegerType => { case n: Number => n.intValue;  case v => v }
      case LongType    => { case n: Number => n.longValue; case v => v }
      case StringType  => v => v.toString
      case other => throw new IllegalStateException(
        s"unexpected cell partition type $other")
    }

  def exists(spark: SparkSession): Boolean =
    new org.apache.hadoop.fs.Path(s"$path/centroids")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$path/centroids"))

  def topK(spark: SparkSession, queries: DataFrame, k: Int,
           nProbe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    // Which cells will be probed? Rank centroids per query exactly as
    // ivfProbe does, keep nProbe per query, collect the ≤ nCells
    // distinct cell ids, and push them into the scan as a static
    // partition filter.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val probedCells: Seq[Any] = q.crossJoin(broadcast(centroids))
      // MUST round exactly as ivfProbe does: this ranking decides
      // which partitions survive pruning, and a divergence from the
      // probe ranking inside ivfProbe would drop candidate cells
      .withColumn("csim",
        Hashing.portableRound(Similarity.cosine(col("qv"), col("centroid")), 6))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nProbe)
      .select(col("cell")).distinct()
      .collect().map(_.get(0)).toSeq
    val raw = spark.read.parquet(s"$path/assigned")
    // Filter with literals of the type partition inference produced
    // (see cellToNative) so the comparison is cast-free and prunes
    // partitions, then restore the centroids-side type for the join.
    val assigned = raw
      .filter(col("cell").isInCollection(probedCells.map(cellToNative(raw))))
      .withColumn("cell",
        col("cell").cast(centroids.schema("cell").dataType))
    // pending removals filter out at probe time (broadcast anti-join —
    // tombstones stay small between compactions by contract)
    val live = tombstones(spark)
      .map(t => assigned.join(broadcast(t), Seq("cid"), "left_anti"))
      .getOrElse(assigned)
    ivfProbe(live, centroids, queries, k, nProbe, idCol, vecCol)
  }
}
