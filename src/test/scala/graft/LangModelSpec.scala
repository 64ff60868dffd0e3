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
}
