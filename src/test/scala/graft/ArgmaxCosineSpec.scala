package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.plans.ArgmaxCosineExpr

/** The native fused argmax-cosine must be BIT-IDENTICAL to the HOF
  * spelling (`array_max(transform(..., struct(portableRound(cosine),
  * cell)))`) it replaces in the quantizers — same sims, same cells,
  * same edge semantics (null elements, length mismatches, zero norms,
  * rounded ties, null vectors, null seeds) — in both codegen and
  * interpreted evaluation.
  */
class ArgmaxCosineSpec extends SparkTestBase {
  import spark.implicits._

  private def hofColumn(rows: Array[Row], cellDt: DataType,
                        seedDt: DataType): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.ColumnBridge
    val entries = rows.map { r =>
      struct(
        ColumnBridge.column(Literal.create(r.get(0), cellDt)).as("cell"),
        ColumnBridge.column(Literal.create(r.get(1), seedDt)).as("seed"))
    }
    array_max(transform(array(entries.toIndexedSeq: _*), s =>
      struct(
        Hashing.portableRound(Similarity.cosine(col("cv"), s.getField("seed")), 6)
          .as("sim"),
        s.getField("cell").as("cell"))))
  }

  private def compareBoth(vectors: DataFrame, seeds: Array[Row],
                          cellDt: DataType, seedDt: DataType): Unit = {
    val native = ArgmaxCosineExpr.forSeeds(col("cv"), seeds, cellDt, seedDt)
      .getOrElse(fail("native path must accept these seeds"))
    val both = vectors
      .withColumn("_h", hofColumn(seeds, cellDt, seedDt))
      .withColumn("_n", native)
      .select(col("cid"),
        col("_h.sim").as("hs"), col("_h.cell").as("hc"),
        col("_n.sim").as("ns"), col("_n.cell").as("nc"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.get(1) === r.get(3),
        s"sim diverged for cid ${r.get(0)}: HOF ${r.get(1)} native ${r.get(3)}")
      assert(r.get(2) === r.get(4),
        s"cell diverged for cid ${r.get(0)}: HOF ${r.get(2)} native ${r.get(4)}")
    }
  }

  private def seedRows(xs: (Long, Seq[Float])*): Array[Row] =
    xs.map { case (c, v) => Row(c, if (v == null) null else v) }.toArray

  private val cellDt = LongType
  private val seedDt = ArrayType(FloatType, containsNull = true)

  private def vecDf(xs: (Long, Seq[java.lang.Float])*): DataFrame = {
    val schema = StructType(Seq(
      StructField("cid", LongType),
      StructField("cv", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(
      java.util.Arrays.asList(xs.map { case (id, v) =>
        Row(id, if (v == null) null else v.map(f =>
          if (f == null) null else f.floatValue()))
      }: _*), schema)
  }

  private def f(v: Float): java.lang.Float = java.lang.Float.valueOf(v)

  test("random vectors: native ≡ HOF on sims and cells (codegen + interpreted)") {
    val rnd = new scala.util.Random(42)
    def rv(d: Int) = Seq.fill(d)(f(rnd.nextFloat() * 2 - 1))
    val seeds = seedRows((0L until 37L).map(c =>
      c -> Seq.fill(16)(rnd.nextFloat() * 2 - 1)): _*)
    val vecs = vecDf((0L until 200L).map(i => i -> rv(16)): _*)
    compareBoth(vecs, seeds, cellDt, seedDt)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try compareBoth(vecs, seeds, cellDt, seedDt)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("edge semantics: nulls, mismatches, zero norms, ties, null vectors") {
    val seeds = seedRows(
      5L -> Seq(1f, 0f, 0f),
      3L -> Seq(1f, 0f, 0f),          // identical to cell 5 → rounded tie
      7L -> Seq(0f, 0f, 0f),          // zero norm → always null sim
      9L -> Seq(1f, 1f),              // length mismatch vs 3-dim vectors
      11L -> null)                    // null seed → always null sim
    val vecs = vecDf(
      1L -> Seq(f(1f), f(0.5f), f(0f)),   // plain
      2L -> Seq(f(0f), f(0f), f(0f)),     // zero vector → all null sims
      3L -> Seq(f(1f), null, f(0f)),      // null element → all null sims
      4L -> Seq.empty[java.lang.Float],   // empty → all null sims
      5L -> null,                         // null vector → all null sims
      6L -> Seq(f(1f), f(0f), f(0f)))     // exact tie between cells 3, 5
    compareBoth(vecs, seeds, cellDt, seedDt)
    // pin the tie and all-null rules explicitly (not just parity):
    val native = ArgmaxCosineExpr.forSeeds(col("cv"), seeds, cellDt, seedDt).get
    val out = vecs.withColumn("_n", native)
      .select(col("cid"), col("_n.sim"), col("_n.cell"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getLong(2))))
      .toMap
    assert(out(6L) === ((Some(1.0), 5L)), "rounded tie must take the larger cell")
    assert(out(2L)._1.isEmpty && out(2L)._2 === 11L,
      "all-null sims must take the largest cell with null sim")
    assert(out(5L)._1.isEmpty && out(5L)._2 === 11L)
  }

  test("assignToSeeds parity: scan-side native ≡ legacy join form") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val corpus = spark.range(300).toDF("vec_id")
      .withColumn("embedding", array((0 until dim).map(d =>
        Hashing.portableRound(
          sin(col("vec_id") * (d + 1.7)), 6).cast("float")): _*))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val seeds = Similarity.ivfSeeds(corpus, 24, "vec_id", "embedding")
    val fast = Similarity.assignToSeeds(c, seeds)
      .select("cid", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // legacy join form, inlined (the >gate fallback path)
    val slow = c.join(seeds)
      .withColumn("sim",
        Hashing.portableRound(Similarity.cosine(col("cv"), col("seed")), 6))
      .groupBy(col("cid"))
      .agg(max(struct(col("sim"), col("cell"))).getField("cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("generated code actually COMPILES (janino), incl. function extraction") {
    // Regression: Spark's Expression.genCode extracts large expression
    // bodies into helper functions via an outer s"""...""".stripMargin
    // — any emitted line whose first non-blank char is '|' (e.g. a
    // `|| cond` continuation) loses its prefix there and the janino
    // compile fails SILENTLY (Spark falls back to interpreted eval, an
    // ERROR log the only witness). Generating the projection directly
    // turns that silent fallback into a test failure.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val expr = ArgmaxCosineExpr(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      IndexedSeq(0L, 1L),
      IndexedSeq(IndexedSeq(1.0, 2.0), IndexedSeq(3.0, 4.0)),
      IndexedSeq(false, false), IntegerType)
    // throws CompileException (no interpreted fallback at this layer)
    // if the emitted Java is malformed
    GenerateUnsafeProjection.generate(Seq(expr.asInstanceOf[Expression]))
  }
}
