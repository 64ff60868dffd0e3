package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state machine over the silver rides stream:
  * tracks, per driver, a running ride count and the length of the
  * current consecutive-suspicious streak, emitting an alert row
  * whenever the streak reaches `streakThreshold`.
  *
  * This is the `flatMapGroupsWithState` surface — arbitrary per-key
  * state beyond what windowed aggregation can express (the reference
  * has no analog; SURVEY.md §2.9 T8 notes foreachBatch is its only
  * stateful user-code hook). State is one small case class per driver:
  * at 100 TB the state store scales with |drivers|, not event volume,
  * and the stream shuffles once on the driver key.
  */
object AnomalyTracker {

  case class RideObs(driver_id: String, event_timestamp: java.sql.Timestamp,
                     is_suspicious: Boolean)
  case class DriverState(rides: Long, streak: Long)
  case class Alert(driver_id: String, streak: Long, total_rides: Long,
                   at: java.sql.Timestamp)

  def trackerFunc(withTimeouts: Boolean, streakThreshold: Long = 3L)(
                  driverId: String,
                  rows: Iterator[RideObs],
                  state: GroupState[DriverState]): Iterator[Alert] = {
    // validate here too (not just in alerts): this function is public
    // and runs inside the streaming task, where `streak % 0` would
    // kill the query with an opaque ArithmeticException and a
    // negative threshold would silently never alert
    require(streakThreshold > 0,
      s"streakThreshold must be positive, got $streakThreshold")
    if (state.hasTimedOut) {
      // idle driver: event-time timeout fired with no new rows —
      // surface it as a streak-0 tombstone alert and drop the state
      // (bounds the state store to ACTIVE drivers).
      val st = state.get
      state.remove()
      return Iterator.single(Alert(driverId, 0L, st.rides,
        new java.sql.Timestamp(state.getCurrentWatermarkMs())))
    }
    var st = state.getOption.getOrElse(DriverState(0L, 0L))
    val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
    var maxEvent = Long.MinValue
    // event-time order within the batch for a deterministic streak
    rows.toSeq.sortBy(r => (r.event_timestamp.getTime, r.is_suspicious))
      .foreach { r =>
        val streak = if (r.is_suspicious) st.streak + 1 else 0L
        st = DriverState(st.rides + 1, streak)
        maxEvent = math.max(maxEvent, r.event_timestamp.getTime)
        if (r.is_suspicious && streak > 0 && streak % streakThreshold == 0)
          alerts += Alert(driverId, streak, st.rides, r.event_timestamp)
      }
    state.update(st)
    // expire a driver 1 h (event time) after their last observed ride
    // (batch mode has no watermark → no timeouts)
    if (withTimeouts && maxEvent > Long.MinValue)
      state.setTimeoutTimestamp(
        math.max(maxEvent, state.getCurrentWatermarkMs()) + 3600 * 1000L)
    alerts.iterator
  }

  /** Wire the tracker over a silver-schema stream (batch or
    * streaming Dataset — the same function serves tests and prod).
    * Alerts fire at every multiple of `streakThreshold` consecutive
    * suspicious rides.
    */
  def alerts(silver: DataFrame, streakThreshold: Long = 3L): Dataset[Alert] = {
    require(streakThreshold > 0,
      s"streakThreshold must be positive, got $streakThreshold")
    val spark = silver.sparkSession
    import spark.implicits._
    val base = silver.select("driver_id", "event_timestamp", "is_suspicious")
    // event-time timeouts need a watermark in streaming mode
    val withWm =
      if (base.isStreaming) base.withWatermark("event_timestamp", "10 minutes")
      else base
    val timeout =
      if (base.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    withWm
      .as[RideObs]
      .groupByKey(_.driver_id)
      .flatMapGroupsWithState[DriverState, Alert](
        OutputMode.Append, timeout)(
        trackerFunc(base.isStreaming, streakThreshold))
  }
}
