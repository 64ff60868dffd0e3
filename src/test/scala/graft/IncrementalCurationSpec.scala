package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.ParquetUpsertSink

/** The incremental-pipeline contract: per-document curation signals
  * recomputed over ONLY the CDC delta (`changesBetween`), merged with
  * the previous run's scores, must equal a full recompute over the
  * new snapshot. This is what makes nightly curation affordable at
  * 100 TB — and it is only TRUE for per-doc signals (quality gates,
  * lang-ID, token stats); corpus-global signals (LM floors, cross-doc
  * span dedup) shift with every ingest and must rescan. The test pins
  * both halves of that statement.
  */
class IncrementalCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def score(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    docs.select(col("doc_id"), col("text"))
      .withColumn("toks", toks)
      .select(col("doc_id"),
        Text.qualityScore(col("text"), col("toks")).as("q"),
        Text.langId(col("toks")).as("lang_guess"),
        size(col("toks")).cast("long").as("n_toks"))
  }

  test("delta-scored per-doc signals equal a full recompute") {
    val dir = tmpDir("inccur") + "/docs"
    val sink = new ParquetUpsertSink(dir, Seq("doc_id"), retainVersions = 3)
    val v0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on"),
      (2L, "a short one"),
      (3L, "el rapido zorro de la pradera y los campos de trigo"))
      .toDF("doc_id", "text")
    sink.upsert(spark, v0, batchId = 0)
    val scores0 = score(sink.readVersion(spark, 0))

    // ingest: doc 2 rewritten, doc 4 new, docs 1/3 untouched
    val v1 = Seq(
      (2L, "a much longer document of the kind the quality gate is for"),
      (4L, "le renard et le chien dans les champs et la foret"))
      .toDF("doc_id", "text")
    sink.upsert(spark, v1, batchId = 1)

    val delta = sink.changesBetween(spark, 0, 1)
    assert(delta.select("doc_id").as[Long].collect().sorted
      === Array(2L, 4L), "delta must be exactly the changed + new docs")

    // incremental = old scores for untouched docs + delta rescored
    val incremental = scores0
      .join(delta.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(score(delta))
    val full = score(sink.readVersion(spark, 1))
    assert(incremental.collect().toSet === full.collect().toSet,
      "incremental per-doc scoring diverged from the full recompute")
  }

  test("a doc retracted upstream disappears downstream via the change feed") {
    val dir = tmpDir("inccurdel") + "/docs"
    val sink = new ParquetUpsertSink(dir, Seq("doc_id"), retainVersions = 4)
    val v0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs on"),
      (2L, "a short one"),
      (3L, "el rapido zorro de la pradera y los campos de trigo"))
      .toDF("doc_id", "text")
    sink.upsert(spark, v0, batchId = 0)
    val scores0 = score(sink.readVersion(spark, 0))

    // ingest: doc 2 rewritten, doc 4 new — and doc 3 RETRACTED (a
    // takedown / opt-out, the case changesBetween alone cannot see)
    sink.upsert(spark, Seq(
      (2L, "a much longer document of the kind the quality gate is for"),
      (4L, "le renard et le chien dans les champs et la foret"))
      .toDF("doc_id", "text"), batchId = 1)
    sink.delete(spark, col("doc_id") === 3L, batchId = 2)

    val feed = sink.changeFeed(spark, 0, sink.currentVersion(spark))
    val retracted = feed.filter(col("_change_type") === "delete")
      .select("doc_id")
    val rescored = score(
      feed.filter(col("_change_type") =!= "delete").drop("_change_type"))
    // incremental = old scores minus (retracted ∪ rescored keys) +
    // rescored delta — no read of the untouched docs' text
    val incremental = scores0
      .join(rescored.select("doc_id").unionByName(retracted),
        Seq("doc_id"), "left_anti")
      .unionByName(rescored)
    val full = score(sink.read(spark))
    assert(incremental.collect().toSet === full.collect().toSet,
      "incremental scoring with deletes diverged from full recompute")
    assert(incremental.filter(col("doc_id") === 3L).isEmpty,
      "retracted doc 3 must not survive downstream")
  }

  test("corpus-global signals are NOT incremental-safe (documented)") {
    // the unigram-LM mean log-prob of an UNCHANGED doc moves when the
    // corpus around it changes — the reason docs_unigram_logprob-class
    // signals must rescan while quality-gate-class signals may not
    def lmScore(docs: DataFrame): DataFrame = {
      val words = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("word"))
      val freq = words.groupBy("word").agg(count(lit(1)).as("wn"))
      val tot = freq.agg(sum("wn")).first().getLong(0).toDouble
      words.join(broadcast(freq), "word")
        .groupBy("doc_id")
        .agg(avg(log(col("wn").cast("double") / lit(tot))).as("alp"))
    }
    val a = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha beta"))
      .toDF("doc_id", "text")
    val b = a.unionByName(
      Seq((3L, "delta delta delta epsilon")).toDF("doc_id", "text"))
    val before = lmScore(a).filter(col("doc_id") === 1L)
      .first().getDouble(1)
    val after = lmScore(b).filter(col("doc_id") === 1L)
      .first().getDouble(1)
    assert(math.abs(before - after) > 1e-9,
      "corpus-global signal unexpectedly stable — test fixture broken")
  }
}
