package graft

import org.apache.spark.sql.functions._
import graft.functions.LangModel

/** Durable bigram-model store: path parity, build-once amortization,
  * and frozen-model scoring of unseen corpora.
  */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran"),
    (3L, "a dog sat on a log"),
    (4L, "single"), // < 2 tokens → no bigrams → drops
    (5L, "the cat sat on the mat")
  ).toDF("doc_id", "text")

  test("durable-model path scores identically to the in-run path") {
    val inRun = LangModel.bigramLogprob(docs, "doc_id", "text")
    val durable = LangModel.bigramLogprob(docs, "doc_id", "text",
      modelPath = Some(tmpDir("lm-parity")))
    assert(inRun.except(durable).count() === 0 &&
      durable.except(inRun).count() === 0,
      "durable model diverged from the in-run build")
    // docs with < 2 tokens drop on both paths
    assert(durable.filter(col("doc_id") === 4L).count() === 0)
  }

  test("the model builds once; later runs load the store") {
    val path = tmpDir("lm-once")
    LangModel.bigramLogprob(docs, "doc_id", "text", Some(path)).collect()
    assert(LangModel.modelExists(docs, path))
    def listing(sub: String) = {
      val dir = new java.io.File(s"$path/$sub")
      dir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    }
    val before = (listing("c2"), listing("c1"), listing("vocab"))
    val again = LangModel.bigramLogprob(docs, "doc_id", "text", Some(path))
    again.collect()
    assert((listing("c2"), listing("c1"), listing("vocab")) === before,
      "second run rebuilt the model instead of loading it")
  }

  test("a frozen model scores an unseen corpus with add-one smoothing") {
    val path = tmpDir("lm-frozen")
    LangModel.buildBigramModel(docs, "doc_id", "text", path)
    val unseen = Seq(
      (10L, "the cat sat"),          // all bigrams in-model
      (11L, "zebra quux flubs here") // nothing in-model
    ).toDF("doc_id", "text")
    val scored = LangModel.bigramLogprob(unseen, "doc_id", "text", Some(path))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scored.keySet === Set(10L, 11L))
    assert(scored(10L)._1 === 2L && scored(11L)._1 === 3L)
    // unseen bigrams must score finite (smoothed), and strictly worse
    // than the fully in-model doc
    assert(!scored(11L)._2.isNaN && !scored(11L)._2.isInfinite)
    assert(scored(11L)._2 < scored(10L)._2,
      s"smoothed unseen score not below in-model score: $scored")
  }

  test("a torn store (no vocab marker) rebuilds instead of serving") {
    val path = tmpDir("lm-torn")
    LangModel.buildBigramModel(docs, "doc_id", "text", path)
    // simulate a crash between the count-table writes and the marker
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$path/vocab"))
    assert(!LangModel.modelExists(docs, path))
    val scored = LangModel.bigramLogprob(docs, "doc_id", "text", Some(path))
    assert(scored.count() === 4) // healthy rebuild, 4 docs with bigrams
    assert(LangModel.modelExists(docs, path))
  }

  test("a vocab dir without _SUCCESS (crash mid vocab write) is torn") {
    // the parquet committer creates the output directory at job setup,
    // BEFORE any data commits — a crash inside the vocab write leaves
    // vocab/ present but uncommitted. The directory alone must not
    // validate the store.
    val path = tmpDir("lm-torn-mid")
    LangModel.buildBigramModel(docs, "doc_id", "text", path)
    val marker = new java.io.File(s"$path/vocab/_SUCCESS")
    assert(marker.exists(), "committed build should carry the marker")
    marker.delete()
    assert(!LangModel.modelExists(docs, path),
      "uncommitted vocab dir validated the store")
    // next call rebuilds and serves the healthy model
    val scored = LangModel.bigramLogprob(docs, "doc_id", "text", Some(path))
    assert(scored.count() === 4)
    assert(LangModel.modelExists(docs, path))
  }

  test("forced shuffle_hash model join scores identically to broadcast") {
    import graft.functions.ModelJoin
    val broadcastScores = LangModel.bigramLogprob(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    spark.conf.set(ModelJoin.broadcastMaxRowsKey, "0")
    try {
      val df = LangModel.bigramLogprob(docs, "doc_id", "text")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"threshold 0 did not force the shuffle_hash model join:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"gated join fell back to sort-merge:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"a model table still broadcast at threshold 0:\n$p")
      val gated = df.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(gated === broadcastScores,
        "shuffle_hash path diverged from the broadcast path")
    } finally spark.conf.unset(ModelJoin.broadcastMaxRowsKey)
  }

  test("count-memo key is session-free and path-anchored") {
    import graft.functions.ModelJoin
    // The memo must not retain the SparkSession (the r8 cache stored
    // analyzed plans whose file relations pin the session, so weak
    // keys never cleared) — its key is a string derived from the
    // canonicalized tree + file paths.
    val dirA = tmpDir("memoA"); val dirB = tmpDir("memoB")
    val m = Seq((1L, 0.5), (2L, 0.25)).toDF("tok", "p")
    m.write.mode("overwrite").parquet(dirA)
    m.write.mode("overwrite").parquet(dirB)
    val readA1 = ModelJoin.memoKey(spark.read.parquet(dirA))
    val readA2 = ModelJoin.memoKey(spark.read.parquet(dirA))
    val readB = ModelJoin.memoKey(spark.read.parquet(dirB))
    assert(readA1.isDefined && readA1 === readA2,
      "two reads of the same model path must share one memo entry")
    assert(readA1 !== readB,
      "same-schema models at different paths must NOT share a count")
    // no file relation → no stable session-free identity → not memoized
    assert(ModelJoin.memoKey(m).isEmpty)
  }

  /** Hand-computed mini LM: the engine-independent expectation the
    * capped/uncapped unigram models are checked against.
    */
  private def handUnigram(cap: Int): Map[Long, (Long, Long, Double)] = {
    val toks = Map(
      1L -> "the cat sat on the mat", 2L -> "the cat ran",
      3L -> "a dog sat on a log", 4L -> "single",
      5L -> "the cat sat on the mat"
    ).map { case (id, s) => id -> s.split(" ").toSeq }
    val counts = toks.values.flatten.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong
    }
    val tn = counts.values.sum.toDouble
    val vocab = counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(cap).toMap
    val oovN = tn - vocab.values.sum.toDouble
    toks.map { case (id, ws) =>
      val lps = ws.map(w => math.log(vocab.get(w).map(_.toDouble).getOrElse(oovN) / tn))
      val r = lps.sum / lps.size
      // mirror portableRound on negatives: -floor(-x·10⁶ + 0.5)/10⁶
      id -> (ws.size.toLong, ws.count(w => !vocab.contains(w)).toLong,
        -math.floor(-r * 1e6 + 0.5) / 1e6)
    }
  }

  test("capped unigram with cap ≥ |vocab| equals the uncapped model") {
    val got = LangModel.unigramLogprobCapped(docs, "doc_id", "text", 1000)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === handUnigram(1000))
    assert(got.values.forall(_._2 === 0L), "full-cap run reported OOV tokens")
  }

  test("capped unigram scores OOV tokens as one UNK type") {
    val got = LangModel.unigramLogprobCapped(docs, "doc_id", "text", 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === handUnigram(2))
    assert(got.values.exists(_._2 > 0L),
      "cap 2 produced no OOV tokens — vacuous smoothing test")
    assert(got.values.forall { case (_, _, lp) =>
      !lp.isNaN && !lp.isInfinite
    })
  }

  // ---------- CCNet-style perplexity tiering ----------

  /** en: four docs with strictly ordered scores (corpus wn: x=6 y=4
    * z=2 w=1) → cum·3 ≤ n algebra over n=4 puts exactly d1 in head,
    * d2 in middle, d3/d4 in tail. fr: a 3-doc identical-text level at
    * the top (cum=3 of n=6 → 9 > 6) must land WHOLLY in middle —
    * head stays empty, the straddle never splits equal-quality docs.
    */
  private def tierDocs = Seq(
    (1L, "x x x x", "en"), (2L, "x x y y", "en"),
    (3L, "y y z", "en"), (4L, "z w", "en"),
    (11L, "p q", "fr"), (12L, "p q", "fr"), (13L, "p q", "fr"),
    (14L, "q r", "fr"), (15L, "r s", "fr"), (16L, "s t", "fr")
  ).toDF("doc_id", "text", "lang")

  test("perplexity buckets: tercile algebra and whole-level straddle") {
    val got = LangModel.perplexityBuckets(tierDocs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(4)))
      .toMap
    assert(got.size === 10)
    assert(got(1L) === ("en", "head"))
    assert(got(2L) === ("en", "middle"))
    assert(got(3L) === ("en", "tail") && got(4L) === ("en", "tail"))
    // the identical-score level (cum 3, n 6) straddles the head
    // boundary → whole level goes middle; f4's level closes middle
    // exactly (cum 4 → 12 ≤ 12)
    assert(Seq(11L, 12L, 13L, 14L).forall(got(_) === ("fr", "middle")))
    assert(got(15L) === ("fr", "tail") && got(16L) === ("fr", "tail"))
    assert(!got.values.exists(v => v._1 == "fr" && v._2 == "head"),
      "straddled fr level leaked into head")
  }

  test("perplexity buckets: durable stage hook is result-identical") {
    val dir = tmpDir("pplbuck-stage")
    val durable = LangModel.perplexityBuckets(tierDocs, "doc_id", "text",
      "lang", stage = df => {
        df.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      })
    val local = LangModel.perplexityBuckets(tierDocs, "doc_id", "text", "lang")
    assert(durable.except(local).count() === 0 &&
      local.except(durable).count() === 0,
      "durable-staged tiering diverged from the localCheckpoint path")
  }
}
