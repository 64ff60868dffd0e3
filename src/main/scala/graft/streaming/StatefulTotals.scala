package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-driver lifetime ride / suspicious-ride totals on Spark 4's
  * `transformWithState` — the arbitrary-state API that succeeds
  * `flatMapGroupsWithState` (AnomalyTracker keeps the older surface;
  * this operator demonstrates the replacement side by side). The
  * processor owns one small `ValueState` per driver, updated with one
  * fold per micro-batch, and supports a state TTL so abandoned keys
  * age out of the store without timer bookkeeping — at 100 TB the
  * store scales with |active drivers|, not event volume, and the
  * stream shuffles once on the driver key.
  *
  * `transformWithState` requires the RocksDB state store provider
  * (`MedallionStream.useRocksDbStateStore`), which is also the
  * bounded-heap configuration the 100 TB chain wants.
  */
object StatefulTotals {

  case class DriverTotal(driver_id: String, total_rides: Long,
                         suspicious_rides: Long)

  class TotalsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, AnomalyTracker.RideObs, DriverTotal] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState("totals",
        Encoders.product[(Long, Long)], ttl)

    override def handleInputRows(key: String,
        rows: Iterator[AnomalyTracker.RideObs],
        timers: TimerValues): Iterator[DriverTotal] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { r => n += 1; if (r.is_suspicious) s += 1 }
      totals.update((n, s))
      Iterator.single(DriverTotal(key, n, s))
    }
  }

  /** Running totals stream: one updated row per driver per
    * micro-batch (update output mode). A non-NONE `ttl` requires a
    * clocked time mode — Spark 4.1 rejects TTL under `TimeMode.None()`
    * (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL) — so the
    * processor runs under ProcessingTime exactly when TTL aging is
    * requested; the default stays timer-free. NOTE: under ProcessingTime
    * the engine schedules micro-batches continuously (any batch may
    * fire a TTL sweep), so pair a TTL'd stream with a real trigger
    * interval — the default 0 ms trigger becomes a busy loop, and
    * `processAllAvailable` never sees the stream settle.
    */
  def totals(ds: Dataset[AnomalyTracker.RideObs],
             ttl: TTLConfig = TTLConfig.NONE): Dataset[DriverTotal] = {
    import ds.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.driver_id)
      .transformWithState(new TotalsProcessor(ttl), timeMode,
        OutputMode.Update())
  }

  /** Timer-evicting variant: each batch re-arms a per-key event-time
    * timer at watermark + idleMs; when the timer fires with no
    * intervening rows the key's state is dropped and a streak-0
    * tombstone row (total_rides = -1) is emitted — the
    * `transformWithState` spelling of AnomalyTracker's
    * EventTimeTimeout eviction, keeping the store bounded to ACTIVE
    * drivers. Timers replace GroupState timeouts one-for-one:
    * `registerTimer`/`deleteTimer` are explicit (and per-key
    * multiple), where GroupState allowed one implicit timeout.
    */
  class EvictingTotalsProcessor(idleMs: Long)
      extends StatefulProcessor[String, AnomalyTracker.RideObs, DriverTotal] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState("totals",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[AnomalyTracker.RideObs],
        timers: TimerValues): Iterator[DriverTotal] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      var maxEventMs = Long.MinValue
      rows.foreach { r =>
        n += 1; if (r.is_suspicious) s += 1
        maxEventMs = math.max(maxEventMs, r.event_timestamp.getTime)
      }
      totals.update((n, s))
      // one live timer per key: drop the previous arm, re-arm from the
      // key's own clock. In the first micro-batch the global watermark
      // is still 0 — anchoring on the watermark alone would give every
      // new key a near-epoch timer that fires (and wipes state) on the
      // first watermark advance, so take max(batch max event time,
      // watermark), matching AnomalyTracker's EventTimeTimeout arm.
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(
        math.max(maxEventMs, timers.getCurrentWatermarkInMs()) + idleMs)
      Iterator.single(DriverTotal(key, n, s))
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[DriverTotal] = {
      totals.clear()
      Iterator.single(DriverTotal(key, -1L, -1L))
    }
  }

  /** Totals with idle-key eviction; input must carry a watermark on
    * event_timestamp (event-time timers fire as the watermark
    * advances past them).
    */
  def totalsWithEviction(ds: Dataset[AnomalyTracker.RideObs],
                         idleMs: Long): Dataset[DriverTotal] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("event_timestamp", "1 second")
      .groupByKey(_.driver_id)
      .transformWithState(new EvictingTotalsProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
