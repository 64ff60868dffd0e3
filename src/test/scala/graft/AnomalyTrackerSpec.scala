package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.AnomalyTracker
import graft.streaming.AnomalyTracker.RideObs

/** flatMapGroupsWithState semantics: streak detection across
  * micro-batches with state carried in the state store.
  */
class AnomalyTrackerSpec extends SparkTestBase {
  import spark.implicits._

  private def obs(drv: String, sec: Int, susp: Boolean) =
    RideObs(drv, new java.sql.Timestamp(1704067200000L + sec * 1000L), susp)

  test("alerts fire on 3-streaks, state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RideObs]
    val q = AnomalyTracker.alerts(input.toDF())
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("anomaly-ckpt"))
      .start()

    // batch 1: DRV001 two suspicious; DRV002 three straight
    input.addData(
      obs("DRV001", 1, true), obs("DRV001", 2, true),
      obs("DRV002", 1, true), obs("DRV002", 2, true), obs("DRV002", 3, true))
    q.processAllAvailable()
    val a1 = spark.table("alerts").as[AnomalyTracker.Alert].collect()
    assert(a1.map(_.driver_id).toSeq === Seq("DRV002"))
    assert(a1.head.streak === 3 && a1.head.total_rides === 3)

    // batch 2: DRV001's third suspicious arrives → streak completes
    // across the batch boundary; a clean ride then resets the streak
    input.addData(obs("DRV001", 3, true), obs("DRV001", 4, false),
      obs("DRV001", 5, true))
    q.processAllAvailable()
    val a2 = spark.table("alerts").as[AnomalyTracker.Alert].collect()
    assert(a2.count(_.driver_id == "DRV001") === 1,
      s"got: ${a2.mkString(",")}")
    assert(a2.find(_.driver_id == "DRV001").get.streak === 3)
    q.stop()
  }

  test("event-time timeout evicts idle drivers with a tombstone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RideObs]
    val q = AnomalyTracker.alerts(input.toDF())
      .writeStream.format("memory").queryName("timeout_alerts")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", tmpDir("anomaly-to-ckpt"))
      .start()
    input.addData(obs("DRV009", 1, false))
    q.processAllAvailable()
    // 2 h later (event time): watermark passes DRV009's 1 h timeout
    input.addData(obs("DRV010", 7200, false))
    q.processAllAvailable()
    // one more batch so the timeout fires after the watermark advanced
    input.addData(obs("DRV010", 7300, false))
    q.processAllAvailable()
    val tomb = spark.table("timeout_alerts")
      .as[AnomalyTracker.Alert].collect().filter(_.streak == 0)
    assert(tomb.map(_.driver_id).toSeq === Seq("DRV009"))
    assert(tomb.head.total_rides === 1)
    q.stop()
  }

  test("non-default streakThreshold changes when alerts fire") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RideObs]
    val q = AnomalyTracker.alerts(input.toDF(), streakThreshold = 2L)
      .writeStream.format("memory").queryName("alerts_t2")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("anomaly-t2-ckpt"))
      .start()
    // four straight suspicious rides at threshold 2 → alerts at 2 and 4
    input.addData(obs("DRV005", 1, true), obs("DRV005", 2, true),
      obs("DRV005", 3, true), obs("DRV005", 4, true))
    q.processAllAvailable()
    val got = spark.table("alerts_t2").as[AnomalyTracker.Alert].collect()
      .map(_.streak).sorted.toSeq
    assert(got === Seq(2L, 4L), s"got streaks $got")
    q.stop()
  }

  test("batch-mode alerts match streaming for a generated workload") {
    val silver = graft.operators.Medallion.silverStage(
      graft.operators.Medallion.bronzeProject(
        graft.sources.RideGenerator.events(spark, 5000L)))
    val alerts = AnomalyTracker.alerts(silver).collect()
    // sanity: alerts exist and every alert's streak is a multiple of 3
    assert(alerts.nonEmpty)
    assert(alerts.forall(_.streak % 3 == 0))
  }
}
