package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication: exact (content-hash), MinHash
  * LSH, SimHash, and n-gram Jaccard verification.
  *
  * Shuffle budget is the design driver — at 100 TB the naive
  * all-pairs comparison is impossible (O(n²)), so every operator here
  * follows the standard sketch → bucket → verify shape:
  *   1. per-document sketches are computed scan-side (narrow, codegen'd
  *      array expressions, no UDFs);
  *   2. candidate generation shuffles only (key, doc_id) pairs — the
  *      LSH band trick — never document payloads;
  *   3. exact verification (Jaccard) runs only on the candidate set.
  *
  * All hashes go through [[Hashing.hash60]] (md5-based) so the DuckDB
  * oracle reproduces them bit-for-bit.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct normalized content with
    * the surviving (minimum) doc id and the duplicate count. At scale:
    * one hash-shuffle on the 32-byte fingerprint.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), Text.docFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Rows surviving exact dedup (first doc id per content wins).
    * Window-free formulation: min-id per fingerprint then semi-join,
    * which partial-aggregates map-side; a row_number window would
    * shuffle whole rows.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDupGroups(docs, idCol, textCol).select(col("keep_id"))
    docs.join(keep, docs(idCol) === keep("keep_id"), "left_semi")
  }

  /** Per-document distinct word-shingle sets: (id, shingle) exploded.
    * The base relation for minhash and Jaccard.
    */
  def docShingles(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(
          Text.shingles(Text.tokens(col(textCol)), n))).as("shingle"))

  /** MinHash signatures: k salted-hash minima per document, computed
    * as k `min` aggregates in a SINGLE groupBy(doc_id) — one shuffle,
    * no k× row blowup (the common explode-by-salt formulation
    * multiplies the shuffle by k for no reason).
    * Output: (doc_id, sig array<long> of length k).
    */
  def minhashSignatures(shingles: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i =>
      min(Hashing.saltedHash60(lit(i), col("shingle"))).as(s"mh$i"))
    shingles.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-length signature into `bands` bands and
    * emit (doc_id, band, band_key). Documents sharing any (band,
    * band_key) are near-duplicate candidates. The shuffle key is a
    * 32-byte hash — payload-free candidate generation.
    */
  def lshBands(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat_ws(",",
        (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*))
      struct(lit(b).as("band"), key.as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.band_key"))
  }

  /** Candidate near-duplicate pairs (a < b) from LSH buckets. */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity for every pair of documents sharing at
    * least one shingle, via the inverted-index self-join: shuffle is
    * on the shingle key, intermediate size is Σ_shingle (docs/shingle
    * choose 2) — tractable when shingle document-frequency is bounded
    * (cap hot shingles upstream at real scale; they carry no signal).
    * Returns (doc_a, doc_b, inter, jaccard) for pairs ≥ threshold.
    */
  def jaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val sizes = shingles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))
    val l = shingles.as("l"); val r = shingles.as("r")
    val inter = l.join(r,
        col("l.shingle") === col("r.shingle") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        Hashing.portableRound(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** 60-bit SimHash fingerprints. Per document: every token votes ±1
    * on each of 60 bit positions according to its hash; positive sums
    * set the bit. Implemented as 60 conditional-sum aggregates in one
    * groupBy — a single shuffle of (doc_id, token_hash) pairs.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokHashes = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), Hashing.hash60(col("tok")).as("h"))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b"))
    val fp = (0 until 60).map(b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_ + _)
    tokHashes.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 60-bit fingerprints (bit_count of
    * xor) — the SimHash near-dup predicate.
    */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
