package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Hashing, Text}
import graft.plans.SimhashAgg

/** The imperative SimHash aggregate must agree bit-for-bit with the
  * declarative 60-conditional-sum formulation, including through
  * map-side partial aggregation (merge path).
  */
class SimhashAggSpec extends SparkTestBase {

  test("simhash_agg equals the declarative formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val declarative = Dedup.simhashDeclarative(docs, "doc_id", "text")
    val tokHashes = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), Hashing.hash60(col("tok")).as("h"))
      // many small partitions force non-trivial partial buffers so the
      // merge path is genuinely exercised
      .repartition(16)
    val imperative = tokHashes.groupBy(col("doc_id"))
      .agg(SimhashAgg.simhash_agg(col("h")).as("simhash"))
    assert(imperative.except(declarative).count() === 0 &&
      declarative.except(imperative).count() === 0)
    assert(imperative.count() === declarative.count())
  }

  test("minhash_agg equals the declarative formulation through the merge path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.docShingleHashes(docs, "doc_id", "text", 3)
      .repartition(16) // force non-trivial partial buffers
    val imperative = Dedup.minhashSignatures(sh, 32)
    val declarative = Dedup.minhashSignaturesDeclarative(sh, 32)
    assert(imperative.except(declarative).count() === 0 &&
      declarative.except(imperative).count() === 0)
    assert(imperative.count() === declarative.count())
  }

  test("minhash_agg survives serialize/deserialize round-trip") {
    val agg = graft.plans.MinhashAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), 8)
    val buf = agg.createAggregationBuffer()
    assert(buf.forall(_ == Long.MaxValue))
    buf(0) = 42L; buf(7) = 7L
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq === buf.toSeq)
  }

  test("both aggregates register and run through SQL via extensions") {
    Seq(graft.plans.SimhashAgg.functionDescriptor,
        graft.plans.MinhashAgg.functionDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.docShingleHashes(docs, "doc_id", "text", 3)
    sh.createOrReplaceTempView("shd")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash_agg(sh) AS s, minhash_agg(sh, 8) AS m " +
        "FROM shd GROUP BY doc_id")
    assert(viaSql.count() === 500)
    val row = viaSql.orderBy(col("doc_id")).first()
    assert(row.getSeq[Long](2).length === 8)
  }

  test("simhash_agg survives serialize/deserialize round-trip") {
    val agg = graft.plans.SimhashAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("x")))
    val buf = agg.createAggregationBuffer()
    buf(0) = 5; buf(31) = -3; buf(59) = 1
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq === buf.toSeq)
    assert(agg.eval(back) === ((1L << 0) | (1L << 59)))
  }
}
