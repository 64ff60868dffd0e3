package graft

import org.apache.spark.sql.functions._
import graft.plans.VectorAvgAgg

/** The buffered elementwise-average aggregate must agree with the
  * posexplode + per-(group, dim) avg + array_sort(collect_list)
  * re-assembly it replaced in the centroid recomputes — including
  * nulls (elements and whole vectors), ragged vector lengths, and the
  * merge path through many small partitions.
  */
class VectorAvgAggSpec extends SparkTestBase {
  import spark.implicits._

  private def declarative(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim")).agg(avg(col("x")).as("cval"))
      .groupBy(col("g"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cval")))),
        s => s.getField("cval")).as("vavg"))

  private def imperative(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(VectorAvgAgg.vector_avg(col("v").cast("array<double>"))
        .as("vavg"))
      // the exploded spelling has no row for a group whose every
      // vector is null/empty (posexplode emits nothing) — the same
      // filter the centroid call sites apply
      .filter(size(col("vavg")) > 0)

  test("vector_avg equals the exploded spelling on embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select((col("vec_id") % 7).as("g"), col("embedding").as("v"))
      .repartition(16) // force non-trivial partial buffers
    val a = imperative(emb)
    val b = declarative(emb)
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("vector_avg handles nulls, ragged lengths, and null vectors") {
    val rows: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (1L, Seq[java.lang.Double](5.0, null, 7.0, 9.0)), // null elem + longer
      (1L, null), // whole vector null: contributes nothing
      (2L, Seq[java.lang.Double](null, null)), // all-null dims -> null avgs
      (3L, Seq[java.lang.Double]()) // empty vector
    )
    val df = rows.toDF("g", "v").repartition(4)
    val a = imperative(df)
    val b = declarative(df)
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // spot-check the ragged group: dim 1 averages only the non-null
    val g1 = a.filter(col("g") === 1L)
      .select(col("vavg")).head().getSeq[java.lang.Double](0)
    assert(g1 === Seq(3.0, 2.0, 5.0, 9.0))
  }

  test("vector_avg survives the serialize/deserialize round-trip") {
    val agg = VectorAvgAgg(org.apache.spark.sql.graft.ColumnBridge
      .expression(col("v")))
    val buf = new VectorAvgAgg.Buf(Array(1.5, -2.25), Array(3L, 0L))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sums.toSeq === Seq(1.5, -2.25))
    assert(back.counts.toSeq === Seq(3L, 0L))
  }
}
