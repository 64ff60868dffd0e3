package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The deployment path for the custom plan machinery: one
  * `spark.sql.extensions=graft.plans.GraftExtensions` conf line must
  * wire the top-k rewrite, its planner strategy, and the native SQL
  * functions into a session that never calls the Scala API. Builds
  * its own session (extensions bind at session CREATION — they cannot
  * be added to the shared suite session), so this suite stops and
  * replaces the JVM-wide default; suites run sequentially (forked
  * JVM, no testForkedParallel), and later suites lazily re-create.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("one conf line wires rewrite + strategy + SQL functions") {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.extensions",
        classOf[graft.plans.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // native expressions reachable from pure SQL
      val r = spark.sql(
        """SELECT
          |  cosine_sim(array(3.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  srp_buckets(array(1.0D, 2.0D),
          |              array(1.0D, 1.0D, -1.0D, 1.0D), 1, 2) AS b,
          |  rolling_fp(array('a', 'b')) AS f,
          |  shingle_hashes(array('a', 'b', 'c'), 2) AS sh,
          |  marker_counts(array('the', 'la', 'zz')) AS mc
          |""".stripMargin).head()
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === 11.0)
      assert(r.getSeq[String](2).length === 1) // one bucket key per table
      assert(r.getLong(3) >= 0L)
      assert(r.getSeq[Long](4).length === 2) // two 2-gram windows
      val mc = r.getStruct(5)
      assert(mc.getInt(0) === 1 && mc.getInt(1) === 1 && mc.getInt(3) === 2)
      // non-literal table/plane counts are a hard error, not a miscompile
      val ex = intercept[Exception] {
        spark.sql("SELECT srp_buckets(array(1.0D), array(1.0D), 1 + 0, 1)")
          .head()
      }
      assert(ex.getMessage.contains("integer literal"))

      // native aggregates reachable from pure SQL (simhash/minhash/MG)
      val ag = spark.sql(
        """SELECT simhash_agg(h) AS sh, minhash_agg(h, 4) AS mh,
          |       misra_gries(t, 2) AS mg
          |FROM VALUES (1L, 'a'), (3L, 'a'), (1L, 'b') AS v(h, t)""".stripMargin)
        .head()
      assert(ag.getSeq[Long](1).length === 4)
      val mg = ag.getStruct(2)
      assert(mg.getLong(0) === 3L) // total
      assert(mg.getSeq[org.apache.spark.sql.Row](1).map(r =>
        (r.getString(0), r.getLong(1))).toMap === Map("a" -> 2L, "b" -> 1L))

      // rank-filter rewrite fires with no install() call anywhere
      import spark.implicits._
      Seq((1, "a", 3.0), (1, "b", 1.0), (2, "c", 2.0))
        .toDF("k", "id", "v").createOrReplaceTempView("g_ext_t")
      val q = spark.sql(
        """SELECT k, id FROM (
          |  SELECT k, id,
          |         row_number() OVER (PARTITION BY k ORDER BY v DESC) rn
          |  FROM g_ext_t) WHERE rn <= 1""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"),
        s"rewrite did not fire via extensions:\n$plan")
      assert(q.collect().map(x => (x.getInt(0), x.getString(1))).toSet ===
        Set((1, "a"), (2, "c")))

      // newSession() clones inherit the extensions — the property
      // per-session experimental.extraOptimizations mutation lacks
      val ns = spark.newSession()
      assert(ns.sql("SELECT dot_product(array(1.0D), array(2.0D))")
        .head().getDouble(0) === 2.0)
    } finally spark.stop()
  }
}
