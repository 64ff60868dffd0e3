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

  def trackerFunc(driverId: String, rows: Iterator[RideObs],
                  state: GroupState[DriverState]): Iterator[Alert] = {
    var st = state.getOption.getOrElse(DriverState(0L, 0L))
    val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
    // event-time order within the batch for a deterministic streak
    rows.toSeq.sortBy(r => (r.event_timestamp.getTime, r.is_suspicious))
      .foreach { r =>
        val streak = if (r.is_suspicious) st.streak + 1 else 0L
        st = DriverState(st.rides + 1, streak)
        if (r.is_suspicious && streak > 0 && streak % 3 == 0)
          alerts += Alert(driverId, streak, st.rides, r.event_timestamp)
      }
    state.update(st)
    alerts.iterator
  }

  /** Wire the tracker over a silver-schema stream (batch or
    * streaming Dataset — the same function serves tests and prod).
    */
  def alerts(silver: DataFrame): Dataset[Alert] = {
    val spark = silver.sparkSession
    import spark.implicits._
    silver
      .select("driver_id", "event_timestamp", "is_suspicious")
      .as[RideObs]
      .groupByKey(_.driver_id)
      .flatMapGroupsWithState[DriverState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(trackerFunc)
  }
}
