package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** Multimodal plumbing: schema, batching, determinism of the
  * per-partition kernel (the decode body is a stub; the Spark-side
  * contract is what's under test).
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq((1L, "hello"), (2L, "world!"), (3L, "")).toDF("doc_id", "text"),
    "doc_id", "text", "text/plain")

  test("media table carries payload bytes + typed metadata") {
    val r = media.filter(col("doc_id") === 2L).first()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "world!")
    val meta = r.getStruct(2)
    assert(meta.getString(0) === "text/plain")
    assert(meta.getLong(1) === 6L)
  }

  test("binaryFile ingestion: files land in the media layout, glob-filtered") {
    val dir = tmpDir("media-in")
    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir).resolve(name), bytes)
    write("a.img", Array[Byte](1, 2, 3, 4))
    write("b.img", "payload-bytes".getBytes("UTF-8"))
    write("skip.txt", Array[Byte](9, 9))
    val got = Multimodal.fromBinaryFiles(spark, dir, "image/raw", "*.img")
    assert(got.count() === 2, "glob must exclude skip.txt before read")
    val byName = got.collect()
      .map(r => r.getString(3).split('/').last -> r).toMap
    val a = byName("a.img")
    assert(a.getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3, 4))
    val meta = a.getStruct(2)
    assert(meta.getString(0) === "image/raw" && meta.getLong(1) === 4L)
    // ingested files flow straight through the feature kernel
    val feats = Multimodal.extractFeatures(
      got.select(col("doc_id"), col("payload"), col("meta")))
    assert(feats.count() === 2)
  }

  test("resize kernel: fixed-size deterministic output, empty-safe") {
    val r = Multimodal.resized(media, 4).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    assert(r(1L).length === 4)
    assert(new String(r(1L), "UTF-8") === "hell") // stride-sample of "hello"
    assert(r(3L).length === 0)                    // empty payload
    val again = Multimodal.resized(media.repartition(3), 4).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).toSeq).toMap
    assert(again === r.map { case (k, v) => k -> v.toSeq })
  }

  test("real ImageIO decode: PNG round-trip reproduces every pixel") {
    val ids = Seq(0L, 7L, 123L, 4999L).toDF("doc_id")
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.pngMediaTable(ids, "doc_id", 16, 16)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size === 4)
    for ((id, r) <- feats) {
      assert(r.getInt(1) === 16 && r.getInt(2) === 16)
      // recompute expected statistics from the closed form
      val pix = for (y <- 0 until 16; x <- 0 until 16)
        yield Multimodal.calibrationPixel(id, x, y).toLong
      assert(r.getLong(3) === pix.sum, s"lum_sum mismatch for doc $id")
      val hist = r.getSeq[Long](4)
      assert(hist === (0 until 8).map(b => pix.count(_ >> 5 == b).toLong),
        s"histogram mismatch for doc $id")
    }
  }

  test("image decode survives corrupt payloads and is partition-invariant") {
    // a real PNG, a truncated PNG, text bytes, and a null payload
    val png = Multimodal.calibrationPng(5L, 8, 8)
    val rows = Seq(
      (1L, png),
      (2L, png.take(10)),
      (3L, "definitely not an image".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("doc_id", "payload")
    def run(parts: Int) = Multimodal.decodeImageFeatures(media.repartition(parts))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val got = run(1)
    assert(got(1L).isDefined, "valid PNG must decode")
    assert(got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty,
      "corrupt/non-image/null payloads must yield null stats, not errors")
    assert(run(4) === got)
  }

  test("real audio decode: WAV round-trip reproduces every sample") {
    val ids = Seq(0L, 7L, 123L, 4999L).toDF("doc_id")
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.wavMediaTable(ids, "doc_id", 256, 8000)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size === 4)
    for ((id, r) <- feats) {
      assert(r.getInt(1) === 256 && r.getInt(2) === 8000)
      // recompute expected statistics from the closed form
      val abs = (0 until 256)
        .map(i => math.abs(Multimodal.calibrationSample(id, i).toLong))
      assert(r.getLong(3) === abs.sum, s"amp_sum mismatch for doc $id")
      val hist = r.getSeq[Long](4)
      assert(hist === (0L until 8L).map(b =>
          abs.count(a => math.min(a >> 12, 7L) == b).toLong),
        s"amp histogram mismatch for doc $id")
    }
  }

  test("audio decode survives corrupt payloads and non-PCM16 formats") {
    val wav = Multimodal.wavMediaTable(Seq(5L).toDF("doc_id"),
      "doc_id", 64, 8000).select("payload").first().getAs[Array[Byte]](0)
    val rows = Seq(
      (1L, wav),
      (2L, wav.take(10)),
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val media = rows.toDF("doc_id", "payload")
    def run(parts: Int) = Multimodal.decodeAudioFeatures(media.repartition(parts))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val got = run(1)
    assert(got(1L).isDefined, "valid WAV must decode")
    assert(got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty,
      "corrupt/non-audio/null payloads must yield null stats, not errors")
    assert(run(4) === got)
  }

  test("feature extraction is deterministic and partition-invariant") {
    val f1 = Multimodal.extractFeatures(media.repartition(1)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    val f4 = Multimodal.extractFeatures(media.repartition(4)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(f1 === f4, "kernel output depends on partitioning")
    assert(f1(1L).length === 8)
    // empty payload still yields a (zero) feature, not null/crash
    assert(f1(3L).forall(_ === 0.0f))
  }
}
