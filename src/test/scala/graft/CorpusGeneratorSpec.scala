package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup
import graft.sources.CorpusGenerator

/** The scaling-corpus generator: deterministic at any parallelism and
  * carrying the duplicate structure the dedup operators exist for.
  */
class CorpusGeneratorSpec extends SparkTestBase {

  test("documents are partition-invariant and reproducible") {
    val a = CorpusGenerator.documents(spark, 2000, numPartitions = 4)
    val b = CorpusGenerator.documents(spark, 2000, numPartitions = 13)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "generation depends on partitioning")
  }

  test("corpus carries ~2% exact and ~3% near duplicates") {
    val docs = CorpusGenerator.documents(spark, 5000)
    val n = docs.count()
    assert(n === 5000)
    val survivors = Dedup.exactDedup(docs, "doc_id", "text").count()
    val exactDups = n - survivors
    assert(exactDups > n / 100 && exactDups < n * 4 / 100,
      s"exact-dup count $exactDups outside ~2% band")
    // near duplicates: a doc + its source share all but one token →
    // jaccard close to 1 but below it; the planted rate is ~3%
    val sh = Dedup.docShingleHashes(docs, "doc_id", "text", 3)
    val near = Dedup.jaccardPairs(sh, 0.8).filter(col("jaccard") < 1.0).count()
    assert(near > n / 100, s"too few near-dup pairs: $near")
  }

  test("embeddings are reproducible with planted exact copies") {
    val a = CorpusGenerator.embeddings(spark, 3000, numPartitions = 4)
    val b = CorpusGenerator.embeddings(spark, 3000, numPartitions = 11)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // planted copies: identical vectors under different ids
    val dupVecs = a.groupBy(col("embedding")).count()
      .filter(col("count") > 1).count()
    assert(dupVecs > 10, s"expected planted vector copies, got $dupVecs")
    assert(a.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(64))
  }
}
