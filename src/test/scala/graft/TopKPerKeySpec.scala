package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** The custom per-key top-k operator: result-identical to the
  * row_number formulation, planned without a WindowExec sort.
  */
class TopKPerKeySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("matches row_number().over per-key top-k exactly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val custom = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")), 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val reference = orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"))
    assert(custom.except(reference).count() === 0 &&
      reference.except(custom).count() === 0)
    assert(custom.count() === reference.count())
  }

  test("plans as TopKPerKeyExec with a single exchange, no sort") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val custom = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")), 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), s"unexpected WindowExec:\n$plan")
    assert(!plan.toLowerCase.contains("sortexec"), s"unexpected sort:\n$plan")
  }

  test("optimizer rule rewrites row_number filters to TopKPerKeyExec") {
    graft.plans.TopKRewrite.install(spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"))
    val plan = windowed.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"rewrite did not fire:\n$plan")
    // and the rewritten plan computes the same rows
    val got = windowed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expected = TopKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")), 3)
      .select(col("o_custkey"), col("rank"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("handles k larger than group size and single-row groups") {
    import spark.implicits._
    val tiny = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val got = TopKPerKey(tiny, Seq("k"), Seq(TopKPerKey.desc("v")), 5)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got === Set((1, 20.0, 1), (1, 10.0, 2), (2, 5.0, 1)))
  }

  test("spill fallback at high key cardinality matches heap path") {
    // Force the spill path by shrinking the buffered-row budget far
    // below the key count: every partition overflows its heaps and
    // degrades to the external-sort + streaming-rank fallback.
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val args = (orders, Seq("o_custkey"),
      Seq(TopKPerKey.desc("o_totalprice"), TopKPerKey.asc("o_orderkey")), 3)
    def run(): Set[(Long, Int, Long)] =
      TopKPerKey(args._1, args._2, args._3, args._4)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val heapRows = run()
    spark.conf.set("spark.graft.topk.spillThresholdRows", "16")
    try {
      val spillRows = run()
      assert(spillRows === heapRows)
      assert(spillRows.nonEmpty)
    } finally spark.conf.unset("spark.graft.topk.spillThresholdRows")
  }

  test("spill path handles millions of rows with analytic verification") {
    import spark.implicits._
    // 2M rows, 10k keys × 200 values each: top-5 per key is exactly
    // v ∈ {199..195} with rank 200−v — verifiable by aggregation, no
    // window reference needed at this volume.
    val n = 2000000
    val df = spark.range(n.toLong)
      .select((col("id") % 10000).cast("int").as("k"),
        (col("id") / 10000).cast("int").as("v"))
    spark.conf.set("spark.graft.topk.spillThresholdRows", "1000")
    try {
      val top = TopKPerKey(df, Seq("k"),
        Seq(TopKPerKey.desc("v")), 5)
      val agg = top.groupBy(col("rank"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2),
          r.getInt(3))).toMap
      assert(agg.keySet === Set(1, 2, 3, 4, 5))
      (1 to 5).foreach { rk =>
        val (cnt, lo, hi) = agg(rk)
        assert(cnt === 10000L, s"rank $rk count $cnt")
        assert(lo === 200 - rk && hi === 200 - rk,
          s"rank $rk values [$lo,$hi], expected ${200 - rk}")
      }
    } finally spark.conf.unset("spark.graft.topk.spillThresholdRows")
  }

  test("spill threshold mid-stream keeps already-buffered heap rows") {
    import spark.implicits._
    // 200 keys × 10 rows in ONE partition with a 32-row budget:
    // overflow happens mid-partition, so correctness requires the
    // fallback to re-ingest rows already sitting in heaps.
    val df = (0 until 2000).map(i => (i % 200, i / 200, i))
      .toDF("k", "v", "tie").repartition(1)
    spark.conf.set("spark.graft.topk.spillThresholdRows", "32")
    try {
      val got = TopKPerKey(df, Seq("k"),
        Seq(TopKPerKey.desc("v"), TopKPerKey.asc("tie")), 2)
        .select(col("k"), col("rank"), col("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val expected = (0 until 200).flatMap(k =>
        Seq((k, 1, 9), (k, 2, 8))).toSet
      assert(got === expected)
    } finally spark.conf.unset("spark.graft.topk.spillThresholdRows")
  }
}
