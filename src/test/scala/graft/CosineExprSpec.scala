package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.plans.CosineSimilarityExpr

/** The native codegen'd cosine expression must be bit-identical to
  * the higher-order-function formulation, and registrable for SQL.
  */
class CosineExprSpec extends SparkTestBase {

  private lazy val pairs = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        col("a.embedding").as("va"), col("b.embedding").as("vb"))
  }

  test("native expression is bit-identical to the HOF formulation") {
    val diff = pairs.select(
      Similarity.cosineHof(col("va"), col("vb")).as("hof"),
      CosineSimilarityExpr.cosine_sim(col("va"), col("vb")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff === 0, s"$diff pairs differ between native and HOF cosine")
  }

  test("zero-norm and empty vectors yield NULL (like the HOF), not NaN") {
    import spark.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array[Float](), Array[Float]()),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(
      CosineSimilarityExpr.cosine_sim(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(!got(2).isNullAt(0) && got(2).getDouble(0) === 0.0)
  }

  test("null elements and ragged lengths yield NULL, matching the HOF") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f),
        Array[java.lang.Float](1.0f, 2.0f, 3.0f)),   // null element left
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](1.0f, null)),          // null element right
      (Array[java.lang.Float](1.0f, 2.0f, 3.0f),
        Array[java.lang.Float](1.0f, 2.0f)),          // ragged lengths
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](1.0f, 2.0f, 3.0f)),    // ragged, other side
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](2.0f, 1.0f))           // clean control row
    ).toDF("a", "b")
    val got = df.select(
      CosineSimilarityExpr.cosine_sim(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    (0 until 4).foreach { i =>
      assert(got(i).isNullAt(0), s"row $i: native not NULL")
      assert(got(i).isNullAt(1), s"row $i: HOF not NULL")
    }
    assert(!got(4).isNullAt(0) && got(4).getDouble(0) === got(4).getDouble(1))
  }

  test("native cosine is measurably faster than the HOF formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(200000)
      .select(col("a.embedding").as("va"), col("b.embedding").as("vb"))
      .localCheckpoint(true) // isolate the measurement from the join
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(c: org.apache.spark.sql.Column): Unit =
      pairs.select(sum(c).as("s")).collect()
    // warm both paths (codegen/JIT), then measure
    run(Similarity.cosineHof(col("va"), col("vb")))
    run(CosineSimilarityExpr.cosine_sim(col("va"), col("vb")))
    val tHof = time(run(Similarity.cosineHof(col("va"), col("vb"))))
    val tNative = time(run(CosineSimilarityExpr.cosine_sim(col("va"), col("vb"))))
    info(f"200k pairs x 64 dims: HOF $tHof%.2fs vs native $tNative%.2fs " +
      f"(${tHof / tNative}%.1fx)")
    assert(tNative < tHof,
      f"native ($tNative%.2fs) not faster than HOF ($tHof%.2fs)")
  }

  test("native dot_product is bit-identical to the HOF fold, edges included") {
    val diff = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("hof"),
      graft.plans.DotProductExpr.dot_product(col("va"), col("vb")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff === 0, s"$diff pairs differ between native and HOF dot")
    import spark.implicits._
    val edges = Seq(
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)),
      (Array[java.lang.Float](1.0f, 2.0f, 3.0f), Array[java.lang.Float](1.0f, 2.0f))
    ).toDF("a", "b")
      .select(graft.plans.DotProductExpr.dot_product(col("a"), col("b")).as("d"))
      .collect()
    assert(edges.forall(_.isNullAt(0)), "null element / ragged must be NULL")
  }

  test("cosine_sim registers and runs through SQL via extensions") {
    // injectFunction path, applied to an existing session's registry
    new graft.plans.GraftExtensions()
    spark.sessionState.functionRegistry.registerFunction(
      CosineSimilarityExpr.functionDescriptor._1,
      CosineSimilarityExpr.functionDescriptor._2,
      CosineSimilarityExpr.functionDescriptor._3)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id LIMIT 10""".stripMargin)
      .filter(col("c").between(-1.000001, 1.000001)).count()
    assert(n === 10)
  }
}
