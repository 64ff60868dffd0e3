package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.plans.MisraGriesAgg

/** The Misra-Gries frequent-items aggregate must honor its two
  * deterministic guarantees — est <= exact and exact - est <= n/(k+1),
  * plus presence of every token above the bound — under ANY partition
  * layout (the bound is what the oracle row certifies), and collapse
  * to exact counts when the vocabulary fits in k.
  */
class MisraGriesAggSpec extends SparkTestBase {

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int)
      : (Long, Map[String, Long]) = {
    val row = df.agg(MisraGriesAgg.misra_gries(col("token"), k).as("sk"))
      .select(col("sk.total"), col("sk.items")).head()
    val items = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (row.getLong(0), items)
  }

  private def tokens(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      .select(explode(Text.tokens(col("text"))).as("token"))

  test("MG guarantees hold on real docs across adversarial partitionings") {
    val tk = tokens("sf0.001")
    val exact = tk.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 7, 32); k <- Seq(5, 13, 30)) {
      val (total, est) = sketch(tk.repartition(parts), k)
      assert(total === n, s"parts=$parts k=$k")
      est.foreach { case (t, e) =>
        assert(e >= 1L && e <= exact(t),
          s"overestimate parts=$parts k=$k token=$t")
        assert((exact(t) - e) * (k + 1) <= n,
          s"bound parts=$parts k=$k token=$t est=$e exact=${exact(t)}")
      }
      assert(est.size <= k)
      // every token above n/(k+1) must be present
      exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { t =>
        assert(est.contains(t), s"missing heavy hitter parts=$parts k=$k $t")
      }
    }
  }

  test("exact when the vocabulary fits in k") {
    val tk = tokens("sf0.001").repartition(16)
    val exact = tk.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (total, est) = sketch(tk, exact.size + 4)
    assert(total === exact.values.sum)
    assert(est === exact) // no eviction ever triggers: counts are exact
  }

  test("NULL tokens are ignored and do not count toward n") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("token", StringType, true)))
    val rows = Seq("a", null, "a", "b", null)
      .map(v => org.apache.spark.sql.Row(v))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(3)
    val (total, est) = sketch(df, 4)
    assert(total === 3L)
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }

  test("serialize/deserialize round-trips the counter map") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), 8)
    val st = agg.createAggregationBuffer()
    st.n = 41L
    st.counts.update("alpha", 7L)
    st.counts.update("βeta", 3L) // non-ASCII token exercises UTF-8 length
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n === 41L)
    assert(back.counts.toMap === Map("alpha" -> 7L, "βeta" -> 3L))
  }

  test("merge reduction keeps at most k counters and preserves mass order") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), 2)
    val a = agg.createAggregationBuffer()
    a.n = 10L; a.counts ++= Seq("x" -> 6L, "y" -> 3L)
    val b = agg.createAggregationBuffer()
    b.n = 8L; b.counts ++= Seq("z" -> 5L, "y" -> 2L)
    val m = agg.merge(a, b)
    assert(m.n === 18L)
    // combined: x=6 y=5 z=5; (k+1)=3rd largest is 5 → x=1, y/z dropped
    assert(m.counts.toMap === Map("x" -> 1L))
    assert(m.counts.size <= 2)
  }
}
