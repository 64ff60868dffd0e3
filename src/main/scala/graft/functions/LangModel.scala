package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** Bigram language-model quality proxy with add-one smoothing —
  * mean log P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) per document — with an
  * optional DURABLE model store.
  *
  * The in-memory path (modelPath = None) materializes the bigram
  * stream once per run (localCheckpoint) and rebuilds both
  * vocabulary-scale model tables every time. That is the right shape
  * for a one-shot run, but corpus scoring is usually repeated (new
  * shards, re-curation sweeps), and the model build is the dominant
  * cost at scale — ScaleProof measured it at 191 s per 500k-doc run.
  * `modelPath` is the write-once amortization (the exact pattern
  * [[Dedup.jaccardPairs]]'s indexPath and [[IvfIndex]] proved): the
  * bigram-count, context-count and vocab tables are built ONCE,
  * persisted as parquet, and every later scoring run loads them —
  * paying only the single tokenize-and-join scoring scan.
  *
  * Crash protocol mirrors IvfIndex: `vocab/` (the 1-row table) is
  * written LAST and its committed `_SUCCESS` file is the validity
  * marker — a crash mid-build (even mid vocab write, where the
  * committer has already created the directory) leaves no marker,
  * and the next call rebuilds from scratch; a torn store is never
  * served.
  *
  * Scoring joins LEFT against the model with add-one smoothing
  * coalesces (an unseen bigram scores (0+1)/(c(w₁·)+V), an unseen
  * context (0+1)/(0+V)), so a frozen model scores NEW corpora with
  * the correct smoothing semantics; over the model's own corpus the
  * left join is exactly the inner join (every bigram is in the
  * model), which keeps oracle parity.
  */
object LangModel {

  /** (doc_id, bg, ctx) bigram stream — the shared scan both the model
    * build and the scoring pass run over.
    */
  private def bigramStream(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(Text.shingles(col("toks"), 2)).as("bg"))
      .withColumn("ctx", substring_index(col("bg"), " ", 1))

  /** Per-TOKEN stream carrying each token's following bigram:
    * (doc_id, word, bg) with bg NULL on a document's last token — one
    * row per corpus token. ONE scan now serves all four model
    * consumers: bigrams = the bg-non-null rows (ctx ≡ word by
    * construction), and the vocabulary = COUNT(DISTINCT word) — which
    * previously cost a SECOND full corpus tokenize pass because the
    * bigram-only stream misses each document's last token. Same
    * materialized width as the old (doc_id, bg, ctx) stream (the ctx
    * column IS the word), so the single-scan shape is free.
    */
  private def tokenBigramStream(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "word")))
      .select(col("doc_id"), col("word"),
        // guard before element_at: ANSI mode errors past the array end
        when(col("pos") + 1 < size(col("toks")),
          concat(col("word"), lit(" "),
            element_at(col("toks"), col("pos") + lit(2)))).as("bg"))

  def modelExists(docs: DataFrame, path: String): Boolean = {
    val spark = docs.sparkSession
    // the marker is vocab/_SUCCESS, not the vocab/ directory: the
    // parquet committer creates the output directory (and _temporary)
    // at job SETUP, before any data commits, so a crash mid vocab
    // write leaves the directory present but uncommitted — _SUCCESS
    // is written by the committer only after the job commits (the
    // same validity test sq8TopK's codesPath uses)
    val marker = new Path(s"$path/vocab/_SUCCESS")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(marker)
  }

  /** Build the three model tables from `docs` and persist them at
    * `path` (c2: bigram counts; c1: context counts; vocab: 1-row
    * vocabulary size — the validity marker, written last).
    */
  def buildBigramModel(docs: DataFrame, idCol: String, textCol: String,
                       path: String): Unit = {
    val spark = docs.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$path/vocab"), true) // invalidate FIRST
    // The bigram stream feeds both model aggregations: stage it as
    // parquet BESIDE the model, not localCheckpoint — at 60M bigrams
    // (500k docs) the executor-memory block copy is what dies first
    // (ScaleProof measured AGGREGATE_OUT_OF_MEMORY at exactly this
    // size), and a durable build already owns a durable location.
    val stage = s"$path/_bg_stage"
    tokenBigramStream(docs, idCol, textCol)
      .write.mode("overwrite").parquet(stage)
    val stream = spark.read.parquet(stage)
    val bigrams = stream.filter(col("bg").isNotNull)
      .select(col("doc_id"), col("bg"), col("word").as("ctx"))
    bigrams.groupBy(col("bg")).agg(count(lit(1)).as("bn"))
      .write.mode("overwrite").parquet(s"$path/c2")
    bigrams.groupBy(col("ctx")).agg(count(lit(1)).as("cn"))
      .write.mode("overwrite").parquet(s"$path/c1")
    // V = the full token vocabulary — the per-token stage carries every
    // token (bg NULL on each doc's last), so no extra tokenize pass
    stream.agg(countDistinct(col("word")).cast("double").as("vocab"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    fs.delete(new Path(stage), true)
  }

  /** Per-document mean unigram log-probability under a TOP-V CAPPED
    * vocabulary with UNK smoothing — the documented 100 TB spelling of
    * the corpus-unigram LM proxy (`docs_unigram_logprob` keeps the
    * exact uncapped spelling as its oracle twin).
    *
    * The cap BOUNDS the model instead of re-planning the join: the
    * vocabulary table is at most `vocabCap` rows regardless of corpus
    * size, so the scoring join stays a broadcast forever — the
    * complementary defense to [[ModelJoin]]'s size gate. Out-of-vocab
    * tokens score as ONE aggregate UNK type whose count is the total
    * OOV mass (c(UNK) = tn − Σ_vocab wn), the standard open-vocabulary
    * LM treatment: with `vocabCap` ≥ |vocabulary| no token is OOV and
    * the scores equal the uncapped model's exactly (LangModelSpec pins
    * this parity).
    *
    * Top-V selection is `ORDER BY wn DESC, word` + LIMIT — a total
    * order, so the capped vocabulary is deterministic in any engine,
    * and Catalyst plans the small-limit sort as TakeOrderedAndProject
    * (per-partition heaps, no global sort).
    */
  def unigramLogprobCapped(docs: DataFrame, idCol: String, textCol: String,
                           vocabCap: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(col(textCol))).as("word"))
    // materialized once: the scalar totals below read the tiny table
    // instead of re-scanning the corpus (same shape as the uncapped
    // query), and the size gate needs a countable model
    val (freq, tnOpt) = ModelJoin.checkpointWithSum(
      words.groupBy(col("word")).agg(count(lit(1)).as("wn")), "wn")
    val tn = tnOpt.get.toDouble
    val (vocab, inVocabOpt) = ModelJoin.checkpointWithSum(
      freq.orderBy(col("wn").desc, col("word").asc).limit(vocabCap), "wn")
    val inVocabN = inVocabOpt.getOrElse(0L)
    val oovN = tn - inVocabN
    // oovN = 0 ⇒ no OOV rows exist, so the log(0) literal arm is never
    // evaluated (left join finds every word)
    ModelJoin.sizeGated(words, vocab, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("wn").isNull, 1L).otherwise(0L)).cast("long")
          .as("oov_tokens"),
        Hashing.portableRound(
          avg(log(coalesce(col("wn").cast("double"), lit(oovN)) / lit(tn))),
          6).as("avg_logprob_capped"))
  }

  /** Per-document mean bigram log-probability. With `modelPath` the
    * model tables load from (or are first built at) the durable
    * store; without it they are rebuilt in this run. Identical
    * results either way over the same corpus (LangModelSpec parity).
    */
  def bigramLogprob(docs: DataFrame, idCol: String, textCol: String,
                    modelPath: Option[String] = None): DataFrame = {
    val (scoreStream, c2, c1, v) = modelPath match {
      case Some(path) =>
        if (!modelExists(docs, path)) buildBigramModel(docs, idCol, textCol, path)
        val spark = docs.sparkSession
        // the durable path's only corpus scan: tokenize-and-score
        (bigramStream(docs, idCol, textCol),
         spark.read.parquet(s"$path/c2"),
         spark.read.parquet(s"$path/c1"),
         spark.read.parquet(s"$path/vocab"))
      case None =>
        // the token stream feeds FOUR consumers (both model builds,
        // scoring, and the vocabulary): materialize it once instead of
        // re-tokenizing the corpus per use — measured 1.8× for the
        // bigram consumers alone, and the per-token shape also folds
        // in the vocabulary count, which used to be its own full
        // corpus tokenize pass. The model aggregates are ALSO
        // materialized: the size gate below counts them, and an
        // unmaterialized aggregate would run twice (once for the
        // count, again when the join executes)
        val stream = tokenBigramStream(docs, idCol, textCol)
          .localCheckpoint(true)
        val bigrams = stream.filter(col("bg").isNotNull)
          .select(col("doc_id"), col("bg"), col("word").as("ctx"))
        (bigrams,
         bigrams.groupBy(col("bg")).agg(count(lit(1)).as("bn"))
           .localCheckpoint(true),
         bigrams.groupBy(col("ctx")).agg(count(lit(1)).as("cn"))
           .localCheckpoint(true),
         stream.agg(countDistinct(col("word")).cast("double").as("vocab")))
    }
    // Both model tables grow with the corpus (bigram TYPES
    // near-linearly — the acute case), so the joins are size-gated:
    // broadcast below the row threshold, shuffle_hash on the already-
    // exploded bg/ctx keys above it (see [[ModelJoin]]). v stays an
    // unconditional broadcast — it is one row by construction.
    ModelJoin.sizeGated(
      ModelJoin.sizeGated(scoreStream, c2, Seq("bg"), "left"),
      c1, Seq("ctx"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Hashing.portableRound(
          avg(log((coalesce(col("bn"), lit(0L)).cast("double") + 1.0)
            / (coalesce(col("cn"), lit(0L)).cast("double") + col("vocab")))),
          6).as("avg_bigram_logprob"))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus unigram LM (the [[unigramLogprobCapped]] family's uncapped
    * spelling), then split each LANGUAGE into head / middle / tail
    * terciles by score — the standard "keep the head, sample the
    * middle, drop the tail" curation signal (CCNet, Wenzek et al.
    * 2020; the reference has no LM-quality tiering at all, this is
    * north-star surface).
    *
    * Tercile thresholds are computed on the DISTINCT-SCORE level
    * frame, not per document: a per-doc NTILE would be a total sort
    * of the corpus per language, while the level frame is bounded by
    * the number of distinct 6-dp-rounded scores — the rounding IS the
    * histogram bin structure (CCNet itself buckets on quantized
    * perplexities). Bucket algebra is pure integer arithmetic
    * (`cum·3 ≤ n`, `cum·3 ≤ 2n` over the score-descending cumulative
    * doc count), so there is no float threshold to disagree across
    * engines, and a score level that straddles a tercile boundary
    * lands WHOLLY in the later bucket — identical-quality documents
    * are never split by an id tiebreak.
    *
    * Scale shape: two corpus scans (model build, score) like every
    * corpus-LM filter, both model joins size-gated; the threshold
    * window runs over the level frame partitioned by language; the
    * bucket map joins back to the scored frame through the same size
    * gate. `stage` is the multi-consumer staging hook for the scored
    * frame (it feeds both the level aggregation and the final join) —
    * callers at scale pass a durable spill, the default
    * localCheckpoint suits test/bench SF.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String,
                        stage: DataFrame => DataFrame =
                          _.localCheckpoint(true)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col(idCol).as("doc_id"),
      col(langCol).as("lang"),
      explode(Text.tokens(col(textCol))).as("word"))
    val (freq, tnOpt) = ModelJoin.checkpointWithSum(
      words.groupBy(col("word")).agg(count(lit(1)).as("wn")), "wn")
    val tn = tnOpt.get.toDouble
    val scored = stage(ModelJoin.sizeGated(words, freq, Seq("word"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        Hashing.portableRound(
          avg(log(col("wn").cast("double") / lit(tn))), 6)
          .as("avg_logprob")))
    val lvl = scored.groupBy(col("lang"), col("avg_logprob"))
      .agg(count(lit(1)).as("ln_docs"))
    val tot = lvl.groupBy(col("lang")).agg(sum(col("ln_docs")).as("n"))
    // score-descending cumulative count: keys are distinct within a
    // language by construction, so the default RANGE frame ≡ ROWS in
    // any engine
    val cum = sum(col("ln_docs")).over(
      Window.partitionBy(col("lang")).orderBy(col("avg_logprob").desc))
    val buck = lvl.withColumn("cum", cum)
      .join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("avg_logprob"),
        when(col("cum") * 3 <= col("n"), lit("head"))
          .when(col("cum") * 3 <= col("n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
    ModelJoin.sizeGated(scored, buck, Seq("lang", "avg_logprob"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("avg_logprob"), col("bucket"))
  }
}
