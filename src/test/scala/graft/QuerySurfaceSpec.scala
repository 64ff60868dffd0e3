package graft

import org.apache.spark.sql.functions._

/** Contract-level checks on SparkEntry: the flagship entry point and
  * the queries whose outputs the SQL oracle can't pin exactly
  * (sketches).
  */
class QuerySurfaceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns non-empty gold rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("entry works on a fresh session with default configs") {
    // the driver smokes entry() with its own session — no UTC pin, no
    // legacy confs; events() must self-configure at runtime
    val fresh = spark.newSession()
    assert(SparkEntry.entry(fresh).count() > 0)
  }

  test("every declared oracle has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("approx_count_distinct is within 10% of exact") {
    val approx = SparkEntry.queries("approx_distinct_users")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("silver_clean_filter")(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tpe, ex) =>
      val ap = approx(tpe).toDouble
      assert(math.abs(ap - ex) / ex < 0.10,
        s"$tpe: approx $ap vs exact $ex")
    }
  }

  test("LSH top-k ranks agree with brute force on shared neighbors") {
    val bf = SparkEntry.queries("embed_topk_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val lsh = SparkEntry.queries("embed_topk_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lsh.nonEmpty)
    // For neighbors BOTH paths rank for the same query, LSH's rank
    // order must be consistent with brute force's (cosine scores are
    // totally ordered, so any inversion means a ranking bug).
    lsh.groupBy(_._1).foreach { case (q, rows) =>
      val shared = rows.sortBy(_._2)
        .flatMap { case (_, _, n) => bf.get((q, n)) }
      assert(shared === shared.sorted,
        s"query $q: LSH rank order inverts brute-force order: $shared")
    }
  }
}
