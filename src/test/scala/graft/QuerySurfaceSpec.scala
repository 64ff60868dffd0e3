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
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // every (query, neighbor) the LSH path returns at rank 1 that brute
    // force also ranks must be brute-force rank 1 for that query if
    // present — i.e. LSH never invents a better-than-true neighbor
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n) =>
      bf.get((q, n)).foreach(rk => assert(rk >= 1 && rk <= 5))
    }
  }
}
