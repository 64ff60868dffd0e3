package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Design: media assets are opaque `binary` columns travelling next to
  * a typed metadata struct — the standard lakehouse layout for
  * training-data pipelines (payload stays columnar/compressed in
  * parquet; metadata is filterable without touching bytes, so
  * predicate pushdown prunes scans before any decode).
  *
  * The decode/feature-extract kernel is the only non-columnar step; it
  * runs per-partition in batches (the Scala analog of `mapInPandas`)
  * so a real decoder (JNI/FFI to an image lib) amortizes setup per
  * batch. Two kernels ship:
  *  - [[decodeImageFeatures]] — a REAL image decode through the JDK's
  *    `javax.imageio` (PNG/JPEG, no external jar), oracle-checked end
  *    to end against closed-form calibration images;
  *  - [[decodeAudioFeatures]] — a REAL audio decode through the JDK's
  *    `javax.sound.sampled` (WAV/PCM, headless-safe), oracle-checked
  *    the same way against closed-form calibration clips;
  *  - [[fakeDecode]]/[[fakeResize]] — clearly-marked deterministic
  *    stand-ins for codecs the container does NOT ship (video,
  *    compressed audio), with the real Spark-side contract: schema,
  *    batching, partition-parallelism, and null safety are
  *    production-shaped and tested; only those kernel bodies are fake.
  */
object Multimodal {

  /** Metadata struct carried beside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("checksum", StringType)))

  /** Output schema of the feature-extraction kernel. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("byte_len", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Wrap a source table into the multimodal layout: payload bytes +
    * typed metadata struct. (Testdata has no real media, so the
    * `documents.text` bytes stand in for an encoded asset.)
    */
  def asMediaTable(docs: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("byte_len"),
        md5(encode(col(payloadCol), "UTF-8")).as("checksum")).as("meta"))

  /** Ingest raw media FILES into the media layout via Spark's
    * `binaryFile` source — the on-ramp from an object-store dump of
    * images/audio to the columnar layout. The source yields (path,
    * modificationTime, length, content) with `pathGlobFilter` applied
    * BEFORE bytes are read, so non-matching assets never leave the
    * store; doc ids are the stable hash of the file path.
    */
  def fromBinaryFiles(spark: SparkSession, dir: String, mediaType: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("payload"),
        struct(
          lit(mediaType).as("media_type"),
          col("length").as("byte_len"),
          md5(col("content")).as("checksum")).as("meta"),
        col("path"))

  /** STUB KERNEL — deterministic fake "decode + feature extract".
    * A real implementation decodes the payload (image resize / audio
    * frame-sample) and emits an embedding; this stand-in derives an
    * 8-dim feature from the payload bytes so tests are deterministic.
    * Replace the body, keep the signature.
    *
    * The per-dimension accumulator is an integer byte-sum divided once
    * at the end (not a float running sum): integer addition is
    * associative, so the result is independent of accumulation order
    * and bit-reproducible by any engine — which lets the DuckDB oracle
    * check the whole mapPartitions kernel path end to end
    * (`CAST(SUM(ascii)::DOUBLE / 255.0 AS REAL)`).
    */
  def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff).toLong
      i += 1
    }
    val out = new Array[Float](8)
    i = 0
    while (i < 8) {
      out(i) = (acc(i) / 255.0).toFloat
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction (mapInPandas analog):
    * partition-parallel, zero driver involvement, constant memory per
    * task (iterator in, iterator out — never materializes a
    * partition).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("doc_id"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          // null payload ⇒ byte_len is also null — Row.getLong would
          // NPE; keep the null (distinct from a real zero-byte asset)
          val byteLen: java.lang.Long =
            if (meta.isNullAt(1)) null
            else java.lang.Long.valueOf(meta.getLong(1))
          val feat =
            if (payload == null) null
            else fakeDecode(payload)
          Row(id, meta.getString(0), byteLen, feat)
        }
      }(enc)
  }

  // ---------------- real image decode (JDK ImageIO) ----------------

  /** Output schema of the REAL image-decode kernel. Pixel statistics
    * are exact integers (a sum and an 8-bin histogram of 8-bit
    * luminance), so the kernel's output is bit-reproducible at any
    * parallelism and comparable across engines.
    */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("lum_sum", LongType),
    StructField("lum_hist", ArrayType(LongType))))

  /** Pixel value of the synthetic calibration image for doc `id` at
    * (x, y): a closed form over 64-bit integers, exactly expressible
    * in ANSI SQL. That choice is what makes the REAL decode kernel
    * oracle-checkable end to end: Spark encodes these pixels to PNG
    * and decodes them back through `javax.imageio` (PNG is lossless,
    * so decoded samples equal this formula bit for bit), while the
    * DuckDB oracle recomputes the same statistics straight from the
    * formula — no decoder needed on the oracle side.
    */
  def calibrationPixel(id: Long, x: Int, y: Int): Int =
    ((id * 2654435761L + x * 40503L + y * 65537L) % 256L).toInt

  /** Encode the calibration image for `id` as a real grayscale PNG
    * via the JDK's ImageIO (headless-safe, no external jar).
    * One-shot convenience; batch paths use [[PngEncoder]] so the
    * writer lookup and stream plumbing amortize per partition.
    */
  def calibrationPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val enc = new PngEncoder
    try enc.encode(calibrationImage(id, w, h)) finally enc.close()
  }

  private def calibrationImage(id: Long, w: Int,
                               h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, calibrationPixel(id, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Reusable PNG encoder: ImageIO's static `write` re-runs the
    * writer-provider scan and allocates fresh stream plumbing per
    * image — per-row cost that a batched kernel is supposed to
    * amortize. One instance per partition, `encode` per row,
    * `close()` when the partition ends.
    */
  final class PngEncoder {
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val baos = new java.io.ByteArrayOutputStream()

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      baos.reset()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally ios.close()
      baos.toByteArray
    }

    private var closed = false
    def close(): Unit = if (!closed) { closed = true; writer.dispose() }
  }

  /** Wrap a partition's row iterator so `cleanup` runs when it is
    * exhausted — the release hook for per-partition kernel resources.
    * Also registered as a task-completion listener: a downstream
    * `limit`/`take` can abandon the iterator without ever driving
    * `hasNext` to false, and the listener fires regardless (cleanup
    * implementations must be idempotent — both paths can run).
    */
  private def withCleanup[T](it: Iterator[T])(cleanup: () => Unit): Iterator[T] = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => cleanup())
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) cleanup()
        h
      }
      def next(): T = it.next()
    }
  }

  /** Media table of real PNG payloads, one per id row — encoding runs
    * per-partition on executors (the generator analog of a binaryFile
    * ingest), so building the fixture corpus is as distributed as
    * consuming it. Same layout as [[asMediaTable]].
    */
  def pngMediaTable(ids: DataFrame, idCol: String,
                    w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("doc_id"))
      .mapPartitions { rows =>
        // per-partition setup, per-row reuse: digest instance + PNG
        // writer are allocated once, not once per image
        val md = java.security.MessageDigest.getInstance("MD5")
        val pngEnc = new PngEncoder
        withCleanup(rows.map { r =>
          val id = r.getLong(0)
          val png = pngEnc.encode(calibrationImage(id, w, h))
          md.reset()
          val checksum = md.digest(png).map("%02x".format(_)).mkString
          Row(id, png, Row("image/png", png.length.toLong, checksum))
        })(() => pngEnc.close())
      }(enc)
  }

  /** REAL decode kernel: `javax.imageio` PNG/JPEG decode inside the
    * same batched mapPartitions shape as [[extractFeatures]], emitting
    * exact-integer pixel statistics (8-bit luminance sum + 8-bin
    * histogram). Grayscale reads band 0 of the raster directly;
    * multi-band images use integer Rec.601 luminance
    * ((299·R + 587·G + 114·B) / 1000, truncating division — exact in
    * any engine). Undecodable payloads (not an image, or null) yield
    * null statistics rather than killing the task — at 100 TB a crawl
    * ALWAYS contains corrupt assets, and one bad byte stream must cost
    * one null row, not a stage retry.
    */
  def decodeImageFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // ImageIO defaults to a disk-backed cache stream per decode (a
        // temp FILE per image) — memory-cache instead; the payloads
        // are already in memory
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (payload == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
              // NonFatal, not just IOException: ImageIO throws
              // IllegalArgumentException on CMYK JPEGs and assorted
              // RuntimeExceptions on fuzzed headers — any of them must
              // cost one null row, not a deterministic stage failure
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Row(id, null, null, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val raster = img.getRaster
            val bands = raster.getNumBands
            val hist = new Array[Long](8)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val lum =
                  if (bands >= 3)
                    (299L * raster.getSample(x, y, 0) +
                      587L * raster.getSample(x, y, 1) +
                      114L * raster.getSample(x, y, 2)) / 1000L
                  else raster.getSample(x, y, 0).toLong
                sum += lum
                hist((lum >> 5).toInt & 7) += 1L
                x += 1
              }
              y += 1
            }
            Row(id, w, h, sum, hist.toSeq)
          }
        }
      }(enc)
  }

  // ------------------- REAL audio decode (WAV/PCM) -------------------

  /** 16-bit PCM sample of the synthetic calibration clip for doc `id`
    * at sample index `i` — the audio analog of [[calibrationPixel]]: a
    * closed form over 64-bit integers, exactly expressible in ANSI
    * SQL, so the oracle recomputes decoded-sample statistics without a
    * decoder. Range [-32768, 32767].
    */
  def calibrationSample(id: Long, i: Int): Int =
    ((id * 2654435761L + i * 48271L) % 65536L - 32768L).toInt

  /** Output schema of the audio decode kernel: exact integer
    * amplitude statistics (abs-sum + 8-bin abs histogram), stable at
    * any parallelism and comparable across engines.
    */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("amp_sum", LongType),
    StructField("amp_hist", ArrayType(LongType))))

  private def pcmBytes(id: Long, n: Int): Array[Byte] = {
    // 16-bit signed little-endian mono PCM
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = calibrationSample(id, i)
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    bytes
  }

  /** Media table of real RIFF/WAVE payloads (PCM_SIGNED 16-bit LE
    * mono), one clip per id row, encoded through the JDK's
    * `javax.sound.sampled` (headless-safe — WAV file encode/decode is
    * pure Java, no audio device). Same layout as [[pngMediaTable]].
    */
  def wavMediaTable(ids: DataFrame, idCol: String,
                    nSamples: Int, sampleRate: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val enc = RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("doc_id"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // format object reused across the partition; AudioSystem's
        // provider registry is JVM-cached, so the per-row cost is the
        // stream plumbing only
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false)
        rows.map { r =>
          val id = r.getLong(0)
          val pcm = pcmBytes(id, nSamples)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          val wav = baos.toByteArray
          md.reset()
          val checksum = md.digest(wav).map("%02x".format(_)).mkString
          Row(id, wav, Row("audio/wav", wav.length.toLong, checksum))
        }
      }(enc)
  }

  /** REAL audio decode kernel: `javax.sound.sampled` WAV parse inside
    * the batched mapPartitions shape, emitting exact integer amplitude
    * statistics — abs-sum and an 8-bin histogram of `min(|s| >> 12,
    * 7)` (the `min` keeps -32768, whose |s| is 2¹⁵, in the top bin
    * instead of wrapping). Non-PCM16 or corrupt payloads yield null
    * statistics, not task failures — same crawl-robustness contract as
    * [[decodeImageFeatures]].
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val decoded: Option[(Int, Int, Long, Array[Long])] =
            if (payload == null) None
            else try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 ||
                    fmt.getChannels != 1 ||
                    fmt.getEncoding !=
                      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                  None
                else {
                  val bytes = ais.readAllBytes()
                  val n = bytes.length / 2
                  val big = fmt.isBigEndian
                  val hist = new Array[Long](8)
                  var sum = 0L
                  var i = 0
                  while (i < n) {
                    val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xff
                    val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
                    val s = ((hi << 8) | lo).toShort.toInt
                    val a = math.abs(s.toLong)
                    sum += a
                    hist(math.min(a >> 12, 7L).toInt) += 1L
                    i += 1
                  }
                  Some((n, fmt.getSampleRate.toInt, sum, hist))
                }
              } finally ais.close()
            } catch {
              // NonFatal: the JDK WAV header parser can throw
              // ArrayIndexOutOfBounds/NegativeArraySize on crafted or
              // bit-rotted headers, not just the two declared
              // exceptions — same null-row contract as images
              case scala.util.control.NonFatal(_) => None
            }
          decoded match {
            case Some((n, rate, sum, hist)) =>
              Row(id, n, rate, sum, hist.toSeq)
            case None => Row(id, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Frame/tile sampling over the opaque payload: split the byte
    * stream into fixed-size frames (the video-frame / image-tile
    * access pattern) as pure columnar expressions — explode a frame
    * index sequence, slice with binary substring. No kernel, no UDF;
    * at scale this is how a decoder's work list is generated without
    * reading payloads on the driver.
    */
  def frames(media: DataFrame, frameSize: Int): DataFrame =
    media.select(
      col("doc_id"),
      col("payload"),
      // empty payloads yield ZERO frames — sequence(0, -1) would
      // produce a DESCENDING [0, -1] (Spark defaults the step to -1
      // when start > stop), emitting two bogus frames
      explode(when(col("meta.byte_len") > 0,
        sequence(lit(0),
          ceil(col("meta.byte_len").cast("double") / frameSize)
            .cast("int") - 1))
        .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameSize + 1,
          lit(frameSize)).as("frame"))

  /** STUB KERNEL — deterministic fake "resize": stride-sample the
    * payload down to `outLen` bytes (a real implementation decodes,
    * rescales pixels/samples, and re-encodes). Keeps the contract:
    * fixed-size output, deterministic, null-safe.
    */
  def fakeResize(payload: Array[Byte], outLen: Int): Array[Byte] = {
    if (payload.length == 0) return new Array[Byte](0)
    val out = new Array[Byte](math.min(outLen, payload.length))
    val stride = payload.length.toDouble / out.length
    var i = 0
    while (i < out.length) {
      out(i) = payload((i * stride).toInt)
      i += 1
    }
    out
  }

  /** Batched resize over the media table: same mapPartitions shape as
    * [[extractFeatures]] — the second kernel slot of the
    * decode / feature-extract / resize / frame-sample quartet.
    */
  def resized(media: DataFrame, outLen: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("resized", BinaryType),
      StructField("resized_len", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val out = if (payload == null) null else fakeResize(payload, outLen)
          Row(r.getLong(0), out, if (out == null) 0L else out.length.toLong)
        }
      }(enc)
  }

  /** Oracle-checkable metadata projection (no kernel involved):
    * byte length and checksum of payloads — proves the binary
    * round-trip and pushdown-friendly metadata layout.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      col("meta.byte_len").as("byte_len"),
      col("meta.checksum").as("checksum"))
}
