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

  test("TTL aging runs under ProcessingTime mode (non-NONE TTL starts)") {
    // Regression: a non-NONE TTLConfig under TimeMode.None() throws
    // STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL at query
    // start — totals() must switch to ProcessingTime when TTL is set.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    MedallionStream.useRocksDbStateStore(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AnomalyTracker.RideObs]
      // ProcessingTime time mode runs micro-batches CONTINUOUSLY (any
      // batch may fire a timer/TTL sweep), so processAllAvailable
      // never sees the stream settle — poll the sink for the expected
      // row instead, failing fast if the query itself died.
      val q = StatefulTotals.totals(input.toDS(),
          ttl = org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofHours(1)))
        .writeStream.format("memory").queryName("tws_ttl")
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", tmpDir("twsttl-ckpt"))
        .start()
      def awaitRow(expect: (String, Long, Long)): Seq[(String, Long, Long)] = {
        val deadline = System.nanoTime() + 120e9.toLong
        var rows = Seq.empty[(String, Long, Long)]
        while (System.nanoTime() < deadline && !rows.contains(expect)) {
          q.exception.foreach(e => throw e)
          rows = spark.table("tws_ttl").collect()
            .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
          if (!rows.contains(expect)) Thread.sleep(100)
        }
        rows
      }
      input.addData(r("DRV1", 0, susp = true))
      assert(awaitRow(("DRV1", 1L, 1L)).contains(("DRV1", 1L, 1L)),
        "TTL-configured query produced no batch-1 row")
      input.addData(r("DRV1", 10, susp = false))
      val rows = awaitRow(("DRV1", 2L, 1L))
      assert(rows.contains(("DRV1", 2L, 1L)),
        s"TTL-configured totals did not accumulate: $rows")
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("first-batch keys are not evicted by a small watermark advance") {
    // Regression: the eviction timer was armed at watermark+idleMs; in
    // batch 1 the watermark is still 0 (epoch), so every first-batch
    // key got a 1970 timer that fired — wiping live totals — on the
    // first real watermark advance. The timer must anchor on
    // max(batch max event time, watermark).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    MedallionStream.useRocksDbStateStore(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AnomalyTracker.RideObs]
      val q = StatefulTotals.totalsWithEviction(input.toDS(), idleMs = 5000L)
        .writeStream.format("memory").queryName("tws_firstbatch")
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", tmpDir("twsfb-ckpt"))
        .start()
      input.addData(r("DRV1", 0, susp = false)) // batch 1: watermark = 0
      q.processAllAvailable()
      // advance the watermark by ~2 s — far less than DRV1's 5 s idle
      // budget relative to its own event time, but far past any
      // epoch-anchored timer
      input.addData(r("DRV2", 2, susp = false))
      q.processAllAvailable()
      input.addData(r("DRV2", 3, susp = false)) // timers evaluate here
      q.processAllAvailable()
      val rows = spark.table("tws_firstbatch").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      assert(!rows.contains(("DRV1", -1L, -1L)),
        s"live first-batch key was evicted: ${rows.toSeq}")
      // state is intact: new activity continues the count from 1
      input.addData(r("DRV1", 4, susp = true))
      q.processAllAvailable()
      val cont = spark.table("tws_firstbatch").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      assert(cont.contains(("DRV1", 2L, 1L)),
        s"first-batch state lost: ${cont.toSeq}")
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
