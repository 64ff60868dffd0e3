package graft

import org.apache.spark.sql.functions._
import graft.functions.Dsir

/** DSIR importance weights + Gumbel resample against an independent
  * in-test reference implementation of the same smoothed log-ratio
  * algebra (buckets re-derived from raw MD5, not through the engine).
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "good clean text good text", "en"),
    (2L, "good clean good clean text", "en"),
    (3L, "spam junk spam junk junk", "de"),
    (4L, "good spam text junk clean", "de"),
    (5L, "text text good junk clean", "fr"))

  private def docsDF = corpus.toDF("doc_id", "text", "lang")

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def round6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** Independent reference: doc_id -> (n_features, sum_lr). */
  private def refSums(docs: Seq[(Long, String, String)], tgtLang: String,
                      b: Int, ngram: Int = 1): Map[Long, (Long, Double)] = {
    val toks = docs.map { case (id, t, lang) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = if (ngram == 1) ws
        else ws.sliding(ngram).filter(_.length == ngram)
          .map(_.mkString(" ")).toSeq
      (id, lang == tgtLang, feats.map(w => h60(w) % b))
    }
    val raw = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val tgt = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    toks.foreach { case (_, isT, bs) => bs.foreach { bk =>
      raw(bk) += 1; if (isT) tgt(bk) += 1
    } }
    val rt = raw.values.sum
    val tt = tgt.values.sum
    def lr(bk: Long): Double =
      math.log(((tgt(bk) + 1).toDouble / (tt + b).toDouble)
        / ((raw(bk) + 1).toDouble / (rt + b).toDouble))
    toks.map { case (id, _, bs) =>
      id -> ((bs.length.toLong, bs.map(lr).sum))
    }.toMap
  }

  test("importance weights match the independent reference (B=4 and 64)") {
    for (b <- Seq(4, 64)) {
      val exp = refSums(corpus, "en", b)
      val got = Dsir.importanceWeights(docsDF, "doc_id", "text",
        col("lang") === "en", b).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet === exp.keySet)
      exp.foreach { case (id, (n, slr)) =>
        assert(got(id)._1 === n, s"n_tokens doc $id b=$b")
        assert(math.abs(got(id)._2 - round6(slr / n)) < 1e-9,
          s"avg_lr doc $id b=$b: got ${got(id)._2} exp ${round6(slr / n)}")
      }
    }
  }

  test("bigram features (the paper's config) match the reference") {
    val exp = refSums(corpus, "en", 8, ngram = 2)
    val got = Dsir.importanceWeights(docsDF, "doc_id", "text",
      col("lang") === "en", 8, ngram = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (id, (n, slr)) =>
      assert(got(id)._1 === n, s"n_features doc $id")
      assert(math.abs(got(id)._2 - round6(slr / n)) < 1e-9, s"doc $id")
    }
    // a 1-word doc has no bigram features and is absent, not a null row
    val withShort = (corpus :+ ((9L, "solo", "en"))).toDF(
      "doc_id", "text", "lang")
    val ids = Dsir.importanceWeights(withShort, "doc_id", "text",
      col("lang") === "en", 8, ngram = 2).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("weights are directional: target-like docs above the spam doc") {
    val got = Dsir.importanceWeights(docsDF, "doc_id", "text",
      col("lang") === "en", 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1/2 are the target itself; doc 3 is pure off-target tokens
    assert(got(1L) > got(3L) && got(2L) > got(3L))
  }

  test("empty target set degrades to pure smoothing, never NaN") {
    val exp = refSums(corpus, "xx", 8)
    val got = Dsir.importanceWeights(docsDF, "doc_id", "text",
      col("lang") === "xx", 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    exp.foreach { case (id, (n, slr)) =>
      assert(!got(id).isNaN)
      assert(math.abs(got(id) - round6(slr / n)) < 1e-9, s"doc $id")
    }
  }

  test("token-less docs are absent (explode drops them), not null rows") {
    val withEmpty = (corpus :+ ((9L, "   ", "en"))).toDF(
      "doc_id", "text", "lang")
    val got = Dsir.importanceWeights(withEmpty, "doc_id", "text",
      col("lang") === "en", 16).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("Gumbel resample: deterministic keys, reference order, k cap") {
    val b = 16
    val exp = refSums(corpus, "en", b)
    val expKeys = exp.map { case (id, (_, slr)) =>
      val u = (h60(id.toString) + 1L).toDouble / 1152921504606846976.0
      id -> round6(slr - math.log(math.max(-math.log(u), 1e-300)))
    }
    val expOrder = expKeys.toSeq.sortBy { case (id, k) => (-k, id) }
    val got = Dsir.gumbelResample(docsDF, "doc_id", "text",
      col("lang") === "en", b, 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 3)
    got.zip(expOrder.take(3)).foreach { case ((gi, gk), (ei, ek)) =>
      assert(gi === ei)
      assert(math.abs(gk - ek) < 1e-9)
    }
    // k beyond the corpus returns every doc, same order
    val all = Dsir.gumbelResample(docsDF, "doc_id", "text",
      col("lang") === "en", b, 100).collect().map(_.getLong(0)).toSeq
    assert(all === expOrder.map(_._1))
  }
}
