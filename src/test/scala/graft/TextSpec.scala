package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Edge cases of the text primitives (empty docs, short docs,
  * punctuation-only) that the corpus tables never produce.
  */
class TextSpec extends SparkTestBase {
  import spark.implicits._

  private def one(text: String) = Seq((0L, text)).toDF("doc_id", "text")
    .withColumn("toks", Text.tokens(col("text")))

  test("tokens: empty and whitespace-only strings yield no tokens") {
    assert(one("").select(size(col("toks"))).first().getInt(0) === 0)
    assert(one("   \t  ").select(size(col("toks"))).first().getInt(0) === 0)
    assert(one("a  b\tc").select(size(col("toks"))).first().getInt(0) === 3)
  }

  test("shingles: fewer tokens than n yields empty, exact n yields one") {
    def nsh(s: String) = one(s)
      .select(size(Text.shingles(col("toks"), 3))).first().getInt(0)
    assert(nsh("a b") === 0)
    assert(nsh("a b c") === 1)
    assert(nsh("a b c d") === 2)
  }

  test("quality/ratios handle degenerate inputs without nulls or NaN") {
    val r = one("...!!!").select(
      Text.punctRatio(col("text")).as("p"),
      Text.stopwordRatio(col("toks")).as("s"),
      Text.avgTokenLen(col("toks")).as("a"),
      Text.qualityScore(col("text"), col("toks")).as("q")).first()
    assert(!r.anyNull)
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("NULL text scores like empty text, never a perfect length score") {
    import spark.implicits._
    // least() skips null operands, so an unguarded size(toks)/100 term
    // would hand a NULL-text document lenScore 1.0 (score 0.7) —
    // outscoring every real short document in any curation gate
    val df = Seq(Option.empty[String], Some("")).toDF("text")
      .withColumn("toks", Text.tokens(col("text")))
      .select(Text.qualityScore(col("text"), col("toks")).as("q"))
    val qs = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(qs(0) === qs(1),
      s"null text must score exactly like empty text, got ${qs.toSeq}")
    assert(qs(0).exists(_ <= 0.2))
  }

  test("shingles refuses a non-positive width like its fused twin") {
    intercept[IllegalArgumentException] { Text.shingles(col("toks"), 0) }
  }

  test("langId picks the dominant marker set deterministically") {
    assert(one("the cat and the dog is a pet")
      .select(Text.langId(col("toks"))).first().getString(0) === "en")
    assert(one("le chat et la vache et le chien")
      .select(Text.langId(col("toks"))).first().getString(0) === "fr")
    assert(one("xyz qrs tuv")
      .select(Text.langId(col("toks"))).first().getString(0) === "und")
  }

  test("PII scrub detects and redacts emails, phones and IPv4s") {
    val r = one("reach jane.doe+x@mail.example.org or 555-123-4567 " +
        "or 10.0.0.1 but not 12-34 or a@b")
      .select(
        Text.piiCount(col("text"), Text.emailPattern),
        Text.piiCount(col("text"), Text.phonePattern),
        Text.piiCount(col("text"), Text.ipv4Pattern),
        Text.redactPii(col("text")))
      .first()
    assert(r.getLong(0) === 1)
    assert(r.getLong(1) === 1)
    assert(r.getLong(2) === 1)
    val red = r.getString(3)
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>")
      && red.contains("<IP>"))
    assert(!red.contains("jane.doe") && !red.contains("555-123-4567")
      && !red.contains("10.0.0.1"))
    assert(red.contains("but not 12-34 or a@b"), "non-PII text must survive")
  }

  test("PII redaction order: a phone-shaped email local part is one email") {
    // email runs first, so the digits are gone before the phone pass
    val red = one("x 555-123-4567@mail.com y")
      .select(Text.redactPii(col("text"))).first().getString(0)
    assert(red === "x <EMAIL> y")
  }

  test("pack chunks: boundary-straddling docs split, spans tile exactly") {
    // non-vacuity at the ORACLE gate's scale factor: if no doc ever
    // crossed a sequence boundary, this query would be indistinguish-
    // able from pack_sequences and its oracle pass meaningless
    val chunks = SparkEntry.queries("docs_pack_chunks")(
      spark, "/root/testdata/sf0.01")
    val rows = chunks.collect()
    val continuations = rows.count(_.getAs[Long]("tok_from") > 0L)
    assert(continuations > 0,
      "no doc straddles a sequence boundary at sf0.01 — vacuous query")
    // chunks of one doc must tile [0, n_tokens) without gaps/overlap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val spans = rs.sortBy(_.getAs[Long]("seq_idx"))
        .map(r => (r.getAs[Long]("tok_from"), r.getAs[Long]("tok_to")))
      assert(spans.head._1 === 0L, s"doc $id first chunk not at 0")
      spans.sliding(2).foreach {
        case Array((_, aTo), (bFrom, _)) =>
          assert(aTo === bFrom, s"doc $id chunks gap/overlap at $aTo")
        case _ =>
      }
      assert(spans.forall { case (f, t) => t > f },
        s"doc $id has an empty chunk")
    }
  }

  test("native tokens ≡ HOF filter(split) reference, corpus + edge cases") {
    import spark.implicits._
    // whitespace shapes the corpus never produces: leading/trailing
    // runs, tabs, newlines, unicode text, empty, whitespace-only
    val edges = Seq("", " ", "  \t \n ", "a", " a", "a ", "  a  b\t\nc ",
      "tab\tsep", "nl\nsep", "múltí byte tökens", "a  b", "\na\n")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val corpus = graft.sources.Tables
      .read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(edges.toDF("doc_id", "text"))
    val diff = corpus.select(
      Text.tokens(col("text")).as("n"),
      Text.tokensHof(col("text")).as("h"))
      .filter(not(col("n") <=> col("h")))
    assert(diff.isEmpty,
      s"native tokens diverged from filter(split): ${diff.take(3).toSeq}")
    // null text → null array on both paths
    val nr = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(Text.tokens(col("text")), Text.tokensHof(col("text"))).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native rolling fingerprint ≡ HOF reference, incl. edge cases") {
    assert(graft.plans.RollingFpExpr.B === Text.rollB &&
      graft.plans.RollingFpExpr.M === Text.rollM,
      "native/HOF rolling-hash constants drifted apart")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString))
    } :+ (999L, Seq.empty[String]) // empty → NULL on both paths
    val df = docs.toDF("doc_id", "toks")
    val got = df.select(col("doc_id"),
      Text.rollingFingerprint(col("toks")).as("n"),
      Text.rollingFingerprintHof(col("toks")).as("h")).collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2),
        s"null disagreement for doc ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2),
          s"fingerprint mismatch for doc ${r.getLong(0)}")
    }
    assert(got.count(_.isNullAt(1)) === 1)
    // a NULL element poisons the fold on both paths
    val withNull = Seq((1L, Seq("a", null, "b"))).toDF("doc_id", "toks")
    val nr = withNull.select(Text.rollingFingerprint(col("toks")),
      Text.rollingFingerprintHof(col("toks"))).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native marker counts ≡ HOF filter counts, incl. null tokens") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = (Text.enMarkers ++ Text.frMarkers ++ Text.esMarkers ++
      Seq("zz", "qq", "xx", "", "LA", "The")).toIndexedSeq
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until rnd.nextInt(25)).map(_ =>
        vocab(rnd.nextInt(vocab.size))))
    } :+ (998L, Seq("the", null, "la")) // null token is skipped, not counted
    val df = docs.toDF("doc_id", "tk")
    val mc = graft.plans.MarkerCountsExpr.marker_counts(col("tk"))
    val all = (Text.enMarkers ++ Text.frMarkers ++ Text.esMarkers).distinct
    val got = df.select(col("doc_id"),
      mc.getField("en"), Text.markerCount(col("tk"), Text.enMarkers),
      mc.getField("fr"), Text.markerCount(col("tk"), Text.frMarkers),
      mc.getField("es"), Text.markerCount(col("tk"), Text.esMarkers),
      mc.getField("all"), Text.markerCount(col("tk"), all)).collect()
    got.foreach { r =>
      for (f <- Seq(1, 3, 5, 7))
        assert(r.getInt(f) === r.getInt(f + 1),
          s"marker count mismatch at field $f for doc ${r.getLong(0)}")
    }
  }

  test("native shingle hashes ≡ HOF shingles + hash60") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 150).map { i =>
      val n = rnd.nextInt(30) // includes < width docs → empty array
      (i.toLong, (0 until n).map(_ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString))
    }
    val df = docs.toDF("doc_id", "tk")
    for (w <- Seq(1, 3, 8)) {
      val got = df.select(col("doc_id"),
        graft.plans.ShingleHashesExpr.shingle_hashes(col("tk"), w).as("n"),
        transform(Text.shingles(col("tk"), w),
          s => graft.functions.Hashing.hash60(s)).as("h")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"width $w mismatch for doc ${r.getLong(0)}")
      }
    }
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = one("Hello   World").select(Text.docFingerprint(col("text")))
      .first().getString(0)
    val b = one("hello world").select(Text.docFingerprint(col("text")))
      .first().getString(0)
    assert(a === b)
  }

  // ---------- BPE merge training ----------

  /** Independent driver-side reference trainer: same definition —
    * per-char symbols + `</w>`, overlapping adjacent-pair counts
    * weighted by word frequency, argmax by (count desc, pair asc),
    * greedy left-to-right apply.
    */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var st = words.toSeq.map { case (w, n) =>
      (w.map(_.toString).toVector :+ "</w>", n) }
    val out =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (i <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      st.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n } }
      if (counts.nonEmpty) {
        val ((a, b), cnt) =
          counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((i.toLong, a, b, a + b, cnt))
        st = st.map { case (syms, n) =>
          val nb = scala.collection.mutable.ArrayBuffer[String]()
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              nb += a + b; j += 2
            } else { nb += syms(j); j += 1 }
          }
          (nb.toVector, n)
        }
      }
    }
    out.toSeq
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("BPE merges match an independent driver-side trainer") {
    val texts = Seq("low low low lower lowest", "new newer newest low wider")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Text.bpeMerges(docs, "doc_id", "text", 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === refBpe(wordCounts(texts), 10))
    assert(got.size === 10)
  }

  test("BPE greedy overlap: runs merge left to right, odd positions") {
    // "aaaa" under merge (a,a): positions 0 and 2 apply → [aa, aa];
    // "aaa" → [aa, a] — the merge must not chain into the consumed
    // symbol
    val docs = Seq((1L, "aaaa aaa aaaa")).toDF("doc_id", "text")
    val got = Text.bpeMerges(docs, "doc_id", "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === refBpe(wordCounts(Seq("aaaa aaa aaaa")), 3))
    // round 1 is (a,a) seen 2+3+... times: aaaa has 3 overlapping
    // (a,a) pairs and aaa has 2, aaaa appears twice → count 8
    assert(got.head === ((1L, "a", "a", "aa", 8L)))
    // round 2: after the greedy apply the corpus is [aa,aa,</w>]×2,
    // [aa,a,</w>] — (aa,aa) and (aa,</w>) tie at 2 and the
    // lexicographic tiebreak picks (aa,</w>) ('<' sorts before 'a')
    assert(got(1)._2 === "aa" && got(1)._3 === "</w>" && got(1)._5 === 2L)
  }

  test("BPE encode counts match the reference segmentation") {
    val texts = Seq("low low low lower lowest", "new newer newest low wider")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = refBpe(wordCounts(texts), 6)
    def seg(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (_, a, b, _, _) =>
        val nb = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            nb += a + b; j += 2
          } else { nb += syms(j); j += 1 }
        }
        syms = nb.toVector
      }
      syms
    }
    val expected = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (i.toLong, ws.length.toLong, ws.map(seg(_).length.toLong).sum)
    }.toSet
    val got = Text.bpeEncodeCounts(docs, "doc_id", "text", 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("BPE encode: exhausted training keeps state; OOV falls to chars") {
    val docs = Seq((1L, "ab ab"), (2L, "ab cd cd")).toDF("doc_id", "text")
    // training collapses every word well before 8 merges — the encode
    // must read the CARRIED final state, not an emptied one (the
    // DuckDB mirror carries it through the not-exists arm)
    val got = Text.bpeEncodeCounts(docs, "doc_id", "text", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (2L, 3L, 3L)))
    // encoding FRESH text against the trained state: OOV words count
    // as character-level segmentation (chars + </w>), never dropped
    val (_, st) = Text.bpeTrain(docs, "text", 8)
    val fresh = Seq((9L, "ab zzz")).toDF("doc_id", "text")
    val enc = Text.bpeEncodeCountsFrom(fresh, "doc_id", "text", st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq === Seq((9L, 2L, 5L))) // ab→1 sym; zzz→3 chars+</w>
  }

  test("BPE compression per language: covered langs compress, OOV = 1.0") {
    val train = Seq((1L, "ab ab"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val (_, st) = Text.bpeTrain(train, "text", 8)
    // en/fr words fully collapse (1 symbol each); de is all-OOV so
    // char-level symbols survive untouched → compression exactly 1.0
    val eval = Seq((1L, "ab ab", "en"), (2L, "ab cd cd", "fr"),
      (3L, "zz x", "de")).toDF("doc_id", "text", "lang")
    val got = Text.bpeCompressionByLang(eval, "text", "lang", st)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("en") === ((2L, 6L, 2L, 3.0)))
    assert(got("fr") === ((3L, 9L, 3L, 3.0)))
    assert(got("de") === ((2L, 5L, 5L, 1.0)))
  }

  test("BPE exhaustion: a corpus collapses before nMerges and stops") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab" → a,b,</w>: merges (a,b)→ab, (ab,</w>)→ab</w>, then no
    // pairs remain — asking for 10 merges yields exactly 2
    val got = Text.bpeMerges(docs, "doc_id", "text", 10).collect()
    assert(got.length === 2)
    assert(got.map(_.getString(3)).toSet === Set("ab", "ab</w>"))
  }

  // ---------- incremental trainer vs full re-count ----------

  /** merges + final state from a trainer, in comparable shape. */
  private def trainBoth(texts: Seq[String], k: Int)
      : ((Seq[(Long, String, String, String, Long)], Map[String, Seq[String]]),
         (Seq[(Long, String, String, String, Long)], Map[String, Seq[String]]),
         scala.collection.Map[(String, String), Long]) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def stateMap(st: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
      st.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val (mi, sti, pc) = Text.bpeTrainIncremental(docs, "text", k)
    val (mf, stf) = Text.bpeTrainFull(docs, "text", k)
    ((mi, stateMap(sti)), (mf, stateMap(stf)), pc)
  }

  /** recount adjacent pairs (with multiplicity, weighted by n) from a
    * trained state — the independent check of the maintained map.
    */
  private def recount(texts: Seq[String], st: Map[String, Seq[String]])
      : Map[(String, String), Long] = {
    val wc = wordCounts(texts)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    st.foreach { case (w, syms) =>
      syms.sliding(2).filter(_.size == 2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + wc(w) }
    }
    counts.toMap
  }

  test("incremental trainer ≡ full re-count trainer (merges, state, pair table)") {
    val corpora = Seq(
      Seq("low low low lower lowest", "new newer newest low wider"),
      Seq("aaaa aaa aaaa aab abab"),        // overlap islands
      Seq("ab ab", "ab cd cd"),             // early exhaustion
      Seq("xy yx xy yx"))                   // exact ties everywhere
    corpora.foreach { texts =>
      val ((mi, sti), (mf, stf), pc) = trainBoth(texts, 10)
      assert(mi === mf, s"merge sequences diverged on $texts")
      assert(sti === stf, s"final states diverged on $texts")
      // the maintained pair-count map must equal a from-scratch
      // recount of the final state — the delta algebra's invariant
      assert(pc.toMap === recount(texts, sti),
        s"maintained pair table drifted from recount on $texts")
    }
  }

  test("BPE splits by code point on both trainers (supplementary plane)") {
    // a surrogate-blind split would see 4 UTF-16 units in "x😀" and
    // count pairs against half-characters; both engines (Spark 4's
    // split(w, '') and DuckDB's w[i:i]) advance by code point
    val ((mi, sti), (mf, stf), _) = trainBoth(Seq("x😀 x😀 x😀y"), 2)
    assert(mi === mf && sti === stf)
    assert(mi.head._2 === "x" && mi.head._3 === "😀" &&
      mi.head._4 === "x😀" && mi.head._5 === 3L,
      s"first merge should be (x, 😀) ×3, got ${mi.head}")
    // the untouched tail of "x😀y": y survives as ONE symbol
    assert(sti("x😀y").contains("y"))
  }

  test("checkpointed train resumes exactly where it stopped") {
    val texts = Seq("low low low lower lowest", "new newer newest low wider",
      "aaaa aaa aab abab widest newest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = tmpDir("bpe-ckpt")
    // the uninterrupted reference
    val (full, fullSt, _) = Text.bpeTrainIncremental(docs, "text", 24)
    // phase 1: train 12 rounds with a 4-round durable window
    val (half, _, _) = Text.bpeTrainIncremental(docs, "text", 12,
      durableEvery = 4, checkpointDir = Some(dir))
    assert(half === full.take(12))
    // "crash" = a fresh call against the same dir: resumes at 12 and
    // trains only the remaining rounds
    val (resumed, resumedSt, pc) = Text.bpeTrainIncremental(docs, "text", 24,
      durableEvery = 4, checkpointDir = Some(dir))
    assert(resumed === full,
      "resumed train diverged from the uninterrupted reference")
    def stMap(st: org.apache.spark.sql.DataFrame) =
      st.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(stMap(resumedSt) === stMap(fullSt))
    assert(pc.toMap === recount(texts, stMap(resumedSt)),
      "pair table rebuilt from the resumed state drifted from recount")
    // a torn window (state dir without its ok marker) is invisible
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "state-99"))
    val (again, _, _) = Text.bpeTrainIncremental(docs, "text", 24,
      durableEvery = 4, checkpointDir = Some(dir))
    assert(again === full, "a torn checkpoint window corrupted the resume")
    // resuming against a DIFFERENT corpus refuses loudly
    val other = Seq((1L, "zz zz qq")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Text.bpeTrainIncremental(other, "text", 24, checkpointDir = Some(dir))
    }
    assert(e.getMessage.contains("different corpus"))
    // a checkpoint AHEAD of the request refuses loudly
    intercept[IllegalArgumentException] {
      Text.bpeTrainIncremental(docs, "text", 8, checkpointDir = Some(dir))
    }
  }

  test("merge budget past the old 256 cap: 300 rounds, table stays exact") {
    // 140 distinct 6-char words (base-24 digits of i, so genuinely
    // distinct) → ≥335 merge capacity; 300 rounds cross the
    // durable-checkpoint (64) window several times, so this also
    // proves the chain-management plumbing
    val letters = "abcdefghijklmnopqrstuvwx"
    def word(i: Int): String = {
      val ds = new StringBuilder
      var x = i
      (0 until 4).foreach { _ => ds += letters(x % 24); x /= 24 }
      ds.toString + letters((i * 5 + 3) % 24).toString * 2
    }
    val words = (0 until 140).map(word)
    val texts = Seq(words.mkString(" "))
    val docs = Seq((1L, texts.head)).toDF("doc_id", "text")
    val (mi, sti, pc) = Text.bpeTrainIncremental(docs, "text", 300)
    assert(mi.size === 300, s"expected 300 merges, got ${mi.size}")
    assert(mi === refBpe(wordCounts(texts), 300),
      "merge sequence diverged from the independent reference at depth 300")
    val stMap = sti.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(pc.toMap === recount(texts, stMap),
      "maintained pair table drifted from recount after 300 rounds")
    intercept[IllegalArgumentException] {
      Text.bpeTrainIncremental(docs, "text", 65537)
    }
  }
}
