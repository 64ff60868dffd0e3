package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{AnomalyTracker, MedallionStream, StatefulTotals}

/** transformWithState (Spark 4 arbitrary-state API): per-driver totals
  * accumulate across micro-batches through the RocksDB-backed
  * ValueState, one updated row per key per batch.
  */
class StatefulTotalsSpec extends SparkTestBase {
  import spark.implicits._

  private def r(drv: String, sec: Long, susp: Boolean) =
    AnomalyTracker.RideObs(drv,
      new java.sql.Timestamp(1704067200000L + sec * 1000L), susp)

  test("totals accumulate across batches; each batch emits per key") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    MedallionStream.useRocksDbStateStore(spark) // TWS requires RocksDB
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AnomalyTracker.RideObs]
      val q = StatefulTotals.totals(input.toDS())
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", tmpDir("tws-ckpt"))
        .start()

      input.addData(r("DRV1", 0, susp = true), r("DRV1", 10, susp = false),
        r("DRV2", 20, susp = false))
      q.processAllAvailable()
      // batch 1: DRV1 (2 rides, 1 suspicious), DRV2 (1, 0)
      val b1 = spark.table("tws_totals").collect()
        .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
      assert(b1("DRV1") === (2L, 1L) && b1("DRV2") === (1L, 0L))

      // batch 2: state persisted — totals continue from batch 1
      input.addData(r("DRV1", 30, susp = true))
      q.processAllAvailable()
      val rows = spark.table("tws_totals").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      assert(rows.contains(("DRV1", 3L, 2L)),
        s"state did not accumulate: ${rows.toSeq}")
      // DRV2 had no new rows in batch 2 → no new emission for it
      assert(rows.count(_._1 == "DRV2") === 1)
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time timers evict idle keys with a tombstone") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    MedallionStream.useRocksDbStateStore(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AnomalyTracker.RideObs]
      val q = StatefulTotals.totalsWithEviction(input.toDS(), idleMs = 5000L)
        .writeStream.format("memory").queryName("tws_evict")
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", tmpDir("twse-ckpt"))
        .start()

      input.addData(r("DRV1", 0, susp = false))
      q.processAllAvailable()
      // advance the watermark far past DRV1's 5 s idle timer: DRV2's
      // event at t=60s moves the watermark to ~59s
      input.addData(r("DRV2", 60, susp = false))
      q.processAllAvailable()
      // timers fire on the NEXT batch after the watermark advances
      input.addData(r("DRV2", 70, susp = false))
      q.processAllAvailable()
      val rows = spark.table("tws_evict").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      assert(rows.contains(("DRV1", -1L, -1L)),
        s"idle DRV1 not evicted: ${rows.toSeq}")
      // activity after eviction starts from a clean slate
      input.addData(r("DRV1", 80, susp = true))
      q.processAllAvailable()
      val fresh = spark.table("tws_evict").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      assert(fresh.contains(("DRV1", 1L, 1L)),
        s"evicted key did not restart cleanly: ${fresh.toSeq}")
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
