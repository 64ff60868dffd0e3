package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — Xie et al.,
  * "Data Selection for Language Models via Importance Resampling"
  * (NeurIPS 2023): score every raw document by how much more likely
  * its hashed-n-gram feature counts are under a TARGET corpus
  * distribution than under the raw corpus distribution, then sample
  * by Gumbel-top-k over the importance weights. The pretraining-scale
  * sibling of the reference's quality filter
  * (02_silver_realtime_rides.py:96-104): instead of fixed predicates,
  * the keep/drop signal is learned from a target subset.
  *
  * Shape at 100 TB:
  *   - ONE tokenize pass over the corpus, immediately folded to
  *     per-doc bucket histograms `(doc_id, bucket, cnt)` — the
  *     groupBy is map-side combinable, so the shuffle carries at most
  *     docs × min(doc_len, nBuckets) rows, never raw tokens.
  *   - the histogram feeds two consumers (model build + scoring), so
  *     it stages through the caller-provided `stage` hook — same
  *     durable-vs-local gate as `docs_curation_v2`.
  *   - the bucket model is ≤ nBuckets rows BY CONSTRUCTION; it is
  *     collected once (bounded at the site) and rebuilt as a LOCAL
  *     relation, so the scoring join broadcasts forever and survives
  *     executor loss — the same reasoning as the IVF centroid cache.
  *   - resampling is a deterministic Gumbel perturbation of the
  *     per-doc weight followed by a global top-k
  *     (TakeOrderedAndProject: per-partition bounded heaps, no full
  *     sort).
  *
  * Laplace-smoothed bucket probabilities keep the log-ratio algebra
  * integer-exact up to the final division, so the DuckDB oracle can
  * mirror the arithmetic term for term.
  */
object Dsir {

  /** Per-document importance weights: `(doc_id, n_tokens,
    * avg_dsir_logratio)` where the log-ratio of a feature in bucket b
    * is `ln(pT(b) / pR(b))` with `pX(b) = (count_X(b)+1) /
    * (total_X+B)`. Features are hashed word `ngram`s — the paper's
    * configuration is n = 2 (hashed bigrams); n = 1 (unigrams) keeps
    * the oracle algebra smallest, so the oracle rows use it. The
    * emitted score is the per-feature mean (length-normalized, the
    * filter-signal form); 6-dp portable rounding absorbs float-sum
    * ordering noise as in `docs_unigram_logprob`.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, nBuckets: Int,
                        stage: DataFrame => DataFrame =
                          _.localCheckpoint(true),
                        ngram: Int = 1)
      : DataFrame = {
    val scored = score(docs, idCol, textCol, targetPred, nBuckets, stage,
      ngram)
    scored.select(col("doc_id"),
      col("n_tokens"),
      Hashing.portableRound(
        col("sum_lr") / col("n_tokens").cast("double"), 6)
        .as("avg_dsir_logratio"))
  }

  /** Gumbel-top-k importance resample (the paper's sampling step,
    * made deterministic): key = sum-of-log-ratios + Gumbel noise
    * derived from `hash60(doc_id)`, top k by (key DESC, doc_id).
    * Uses the per-doc SUM (the paper's document weight), not the
    * length-normalized mean.
    */
  def gumbelResample(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, nBuckets: Int, k: Int,
                     stage: DataFrame => DataFrame =
                       _.localCheckpoint(true),
                     ngram: Int = 1)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val scored = score(docs, idCol, textCol, targetPred, nBuckets, stage,
      ngram)
    // u in (0, 1]: +1 in LONG space before the double cast (hash60
    // exceeds 2^53 where double +1.0 no-ops); 2^60 divisor is exact.
    val u = (Hashing.hash60(col("doc_id").cast("string")) + lit(1L))
      .cast("double") / 1152921504606846976.0
    // clamp the inner -ln(u) away from 0: at u = 1 exactly (hash60 =
    // 2^60−1, p ≈ 2^-60) Spark's log(0) is NULL while DuckDB's ln(0)
    // is -inf — a maximal divergence on the interval boundary. The
    // clamp fires ONLY there (the next-largest u gives -ln(u) ≈
    // 8.7e-19 ≫ 1e-300) and both engines parse 1e-300 to the same
    // double, so every other key is bit-unchanged.
    val innerNeg = greatest(-log(u), lit(1e-300))
    scored
      .select(col("doc_id"),
        Hashing.portableRound(col("sum_lr") - log(innerNeg), 6).as("skey"))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Shared core: `(doc_id, n_tokens, sum_lr)` with `sum_lr` the
    * unrounded sum of per-token log-ratios.
    */
  private def score(docs: DataFrame, idCol: String, textCol: String,
                    targetPred: Column, nBuckets: Int,
                    stage: DataFrame => DataFrame,
                    ngram: Int = 1): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= (1 << 20),
      s"nBuckets must be in [2, 2^20] (got $nBuckets)")
    require(ngram >= 1 && ngram <= 8, s"ngram must be in [1, 8] (got $ngram)")
    val spark = docs.sparkSession
    import spark.implicits._
    // n = 1: bare tokens (the oracle spelling); n > 1: word n-grams
    // via the shared shingle builder — same scan shape, the explode
    // just emits size-n+1 features per doc instead of size
    val feats = if (ngram == 1) Text.tokens(col(textCol))
      else Text.shingles(Text.tokens(col(textCol)), ngram)
    val hist = stage(docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_tgt"),
        explode(feats).as("word"))
      .select(col("doc_id"), col("is_tgt"),
        pmod(Hashing.hash60(col("word")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("is_tgt"), col("bucket"))
      .agg(count(lit(1)).as("cnt")))
    // ≤ nBuckets rows by construction — bounded collect at the site.
    val modelRows = hist.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("raw_n"),
        sum(when(col("is_tgt"), col("cnt")).otherwise(lit(0L))).as("tgt_n"))
      .collect()
    val rawTotal = modelRows.map(_.getAs[Long]("raw_n")).sum
    val tgtTotal = modelRows.map(_.getAs[Long]("tgt_n")).sum
    // Local relation (not a localCheckpoint): no executor block to
    // lose, and the broadcast is bounded at nBuckets rows forever.
    val model = modelRows.toSeq
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("raw_n"),
        r.getAs[Long]("tgt_n")))
      .toDF("bucket", "raw_n", "tgt_n")
      .select(col("bucket"), log(
        ((col("tgt_n") + lit(1L)).cast("double")
          / lit((tgtTotal + nBuckets).toDouble))
          / ((col("raw_n") + lit(1L)).cast("double")
            / lit((rawTotal + nBuckets).toDouble))).as("lr"))
    hist.join(broadcast(model), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("long").as("n_tokens"),
        sum(col("cnt").cast("double") * col("lr")).as("sum_lr"))
  }
}
