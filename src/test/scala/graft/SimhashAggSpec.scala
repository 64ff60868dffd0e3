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

  test("simhash_agg matches the declarative form on NULL hashes too") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("doc_id", LongType, false),
      StructField("h", LongType, true)))
    val rows = Seq[(Long, java.lang.Long)](
      (1L, 7L), (1L, null), (1L, 9L),   // null votes -1 on every bit
      (2L, null), (2L, null),           // all-null group
      (3L, 5L)
    ).map(t => org.apache.spark.sql.Row(t._1, t._2))
    val df = spark.createDataFrame(rows.asJava, schema)
    val imperative = df.groupBy(col("doc_id"))
      .agg(SimhashAgg.simhash_agg(col("h")).as("simhash"))
    // declarative reference over the same (doc_id, h) relation
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$b"))
    val fp = (0 until 60).map(b =>
      when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_ + _)
    val declarative = df.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
    assert(imperative.except(declarative).count() === 0 &&
      declarative.except(imperative).count() === 0)
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
