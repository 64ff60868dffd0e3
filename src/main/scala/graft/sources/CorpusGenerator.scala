package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, distributed synthetic document/embedding corpus
  * generator — the documents/embeddings analog of [[RideGenerator]],
  * built for SCALING runs: the testdata tables stop at sf0.1 (5k
  * docs), and proving near-linear scaling of the dedup/ANN family
  * needs corpora 10–100× beyond that, generated at full cluster
  * parallelism with zero driver involvement.
  *
  * Same schemas as the testdata tables
  * (`documents(doc_id, text, lang, source, n_chars)`,
  * `embeddings(vec_id, embedding float[], label)`), same columnar
  * hash-expression technique as RideGenerator: every value derives
  * from seeded hashes of the row id, so any prefix of any size is
  * reproducible at any parallelism.
  *
  * The corpus is dedup-relevant by construction:
  *  - ~2% of docs are EXACT duplicates of an earlier doc;
  *  - ~3% are NEAR duplicates (same base text + one extra token);
  *  - the rest sample a ~800-word vocabulary, 40–200 tokens per doc.
  * Embedding near-dup structure mirrors this with ~2% exact vector
  * copies; vectors are 64-dim in [-1, 1).
  */
object CorpusGenerator {

  private def u(seed: Long, salt: Int): Column =
    (pmod(xxhash64(lit(seed), lit(salt), col("id")), lit(1000000L))
      .cast("double") / 1000000.0)

  /** Token `i` of doc `base`: one of `vocab` vocabulary words chosen
    * by hash — enough distinct shingles that LSH buckets stay
    * discriminating, like real prose. The default ~800 matches the
    * testdata tables; deep-BPE scale runs raise it (a BPE train can
    * only learn ~Σ|word| merges before pair types exhaust, so real
    * 16k+ merge budgets need an open-scale vocabulary).
    */
  private def word(seed: Long, base: Column, i: Column,
                   vocab: Long): Column =
    format_string("w%d",
      pmod(xxhash64(lit(seed), lit(100), base, i), lit(vocab)))

  /** `documents(doc_id, text, lang, source, n_chars)` of `n` rows. */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
                numPartitions: Int = 32, vocab: Long = 800L): DataFrame = {
    val base = spark.range(0, n, 1, numPartitions).toDF()
    val dupRoll = u(seed, 1)
    // duplicates copy a doc from the previous 1000 ids (cluster-local,
    // so dup pairs exist at every prefix size)
    val src = when(dupRoll < 0.05 && col("id") >= 1000L,
      col("id") - 1L - pmod(xxhash64(lit(seed), lit(2), col("id")), lit(1000L)))
      .otherwise(col("id"))
    // text of the SOURCE doc (identical for copies: same src hash
    // chain); array_join over a transform is one linear pass — an
    // aggregate-with-concat fold would rebuild the accumulator string
    // per token (quadratic), and HOFs run interpreted
    val baseText = array_join(
      transform(sequence(lit(0), nTokensOf(seed, src) - 1),
        i => word(seed, src, i, vocab)), " ")
    val text = when(dupRoll < 0.02 && col("id") >= 1000L, baseText) // exact dup
      .when(dupRoll < 0.05 && col("id") >= 1000L,                   // near dup
        concat(baseText, lit(" extra"), format_string("%d", col("id"))))
      .otherwise(baseText)
    base.select(
      col("id").as("doc_id"),
      text.as("text"),
      element_at(array(lit("en"), lit("fr"), lit("es")),
        (pmod(xxhash64(lit(seed), lit(4), col("id")), lit(3L)) + 1).cast("int"))
        .as("lang"),
      format_string("src%d",
        pmod(xxhash64(lit(seed), lit(5), col("id")), lit(20L))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  /** Token count of doc `base` — a pure function of the SOURCE id so
    * exact duplicates reproduce the full source text.
    */
  private def nTokensOf(seed: Long, base: Column): Column =
    (lit(40) + (pmod(xxhash64(lit(seed), lit(3), base), lit(1000000L))
      .cast("double") / 1000000.0) * 160).cast("int")

  /** `embeddings(vec_id, embedding float[], label)` of `n` rows,
    * `dims`-dim vectors in [-1, 1); ~2% exact-copy vectors.
    */
  def embeddings(spark: SparkSession, n: Long, dims: Int = 64,
                 seed: Long = 42L, numPartitions: Int = 32): DataFrame = {
    val base = spark.range(0, n, 1, numPartitions).toDF()
    val dupRoll = u(seed, 11)
    val src = when(dupRoll < 0.02 && col("id") >= 1000L,
      col("id") - 1L - pmod(xxhash64(lit(seed), lit(12), col("id")), lit(1000L)))
      .otherwise(col("id"))
    val vec = transform(sequence(lit(0), lit(dims - 1)),
      d => ((pmod(xxhash64(lit(seed), lit(13), src, d), lit(2000000L))
        .cast("double") / 1000000.0) - 1.0).cast("float"))
    base.select(
      col("id").as("vec_id"),
      vec.as("embedding"),
      pmod(xxhash64(lit(seed), lit(14), src), lit(8L)).cast("int").as("label"))
  }
}
