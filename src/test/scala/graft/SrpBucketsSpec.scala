package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Fused SRP bucketing: bit-parity with the per-table HOF formulation and the codegen-size rationale. */
class SrpBucketsSpec extends SparkTestBase {

  // the production single-table HOF formulation IS the reference here:
  // parity against it guards the fused expression against any drift
  private def hofBucket(vec: Column, planes: Int, dims: Int, t: Int): Column =
    Similarity.srpBucket(vec, planes, dims, tableSalt = t)

  test("fused srp_buckets is bit-identical to per-table HOF bucketing") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fused = e.select(col("vec_id"),
      posexplode(Similarity.srpBuckets(col("embedding"), 4, 64, 8))
        .as(Seq("tbl", "bucket")))
    val hof = e.select(col("vec_id"), explode(array((0 until 8).map(t =>
      struct(lit(t).as("tbl"),
        hofBucket(col("embedding"), 4, 64, t).as("bucket"))): _*)).as("x"))
      .select(col("vec_id"), col("x.tbl").as("tbl"), col("x.bucket").as("bucket"))
    assert(fused.except(hof).count() === 0 && hof.except(fused).count() === 0)
    assert(fused.count() === e.count() * 8)
  }

  test("fused srp_buckets: null element and wrong-length signs yield NULL") {
    import spark.implicits._
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 3.0f, 4.0f)))
      .toDF("v")
      .select(Similarity.srpBuckets(col("v"), planes = 2, dims = 4,
        tables = 2).as("b"))
      .collect()
    assert(withNull.head.isNullAt(0), "null element must null the buckets")
    // signs generated for dims=8 applied to a 4-element vector:
    // length mismatch → NULL, not a silent partial projection
    val ragged = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("v")
      .select(Similarity.srpBuckets(col("v"), planes = 2, dims = 8,
        tables = 2).as("b"))
      .collect()
    assert(ragged.head.isNullAt(0), "dims mismatch must null the buckets")
    // and the happy path at these small params still yields 2 buckets
    val ok = Seq(Tuple1(Array(1.0f, -2.0f, 3.0f, -4.0f))).toDF("v")
      .select(Similarity.srpBuckets(col("v"), planes = 2, dims = 4,
        tables = 2).as("b"))
      .collect().head.getSeq[String](0)
    assert(ok.length === 2 && ok.forall(_.length === 2))
  }

  test("A/B: fused srp_buckets vs per-table HOF bucketing cost") {
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .localCheckpoint(true)
    def runFused(): Unit =
      e.select(col("vec_id"),
          posexplode(Similarity.srpBuckets(col("embedding"), 4, 64, 8))
            .as(Seq("tbl", "b")))
        .write.format("noop").mode("overwrite").save()
    def runHof(): Unit =
      e.select(col("vec_id"), explode(array((0 until 8).map(t =>
          hofBucket(col("embedding"), 4, 64, t)): _*)).as("b"))
        .write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    runFused(); runHof() // codegen + JIT warm-up
    val tf = (1 to 3).map(_ => time(runFused())).min
    val th = (1 to 3).map(_ => time(runHof())).min
    info(f"srp bucketing 8 tables x 4 planes x 64 dims: fused $tf%.3fs vs HOF $th%.3fs (${th / tf}%.2fx)")
    assert(tf < th, f"fused ($tf%.3fs) not faster than HOF ($th%.3fs)")
  }
}
