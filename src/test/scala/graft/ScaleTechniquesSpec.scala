package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale techniques with proof-by-plan: bucketed co-located joins
  * eliminate the shuffle; salted joins preserve results.
  */
class ScaleTechniquesSpec extends SparkTestBase {

  test("bucketed tables join without an exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      // the in-memory catalog forgets tables between JVM runs but the
      // warehouse directories survive — clear them
      Seq("orders_b", "lineitem_b").foreach { t =>
        val dir = new java.io.File(s"spark-warehouse/$t")
        if (dir.exists) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles.foreach(rm)
            f.delete()
          }
          rm(dir)
        }
      }
      spark.read.parquet(s"$sf/orders.parquet").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      spark.read.parquet(s"$sf/lineitem.parquet").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val j = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      assert(j.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("salted join equals the plain join") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", 4)
    val plain = li.join(orders, Seq("l_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("l_quantity")).first().getDouble(0) ===
      plain.agg(sum("l_quantity")).first().getDouble(0))
  }

  test("rate-source streaming generator yields parseable ride events") {
    val q = graft.operators.Medallion.silverStage(
      graft.operators.Medallion.bronzeProject(
        graft.sources.RideGenerator.streamingEvents(spark, 500)),
      streaming = true)
      .writeStream.format("memory").queryName("live_silver")
      .option("checkpointLocation", tmpDir("rate-ckpt"))
      .start()
    try {
      // let a couple of micro-batches through
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("live_silver").isEmpty &&
             System.currentTimeMillis() < deadline) Thread.sleep(500)
      val rows = spark.table("live_silver")
      assert(!rows.isEmpty, "no events parsed from rate source")
      assert(rows.filter(col("ride_id").isNull).count() === 0)
    } finally q.stop()
  }
}
