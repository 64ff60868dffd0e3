package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.MedallionStream

/** Streaming session windows: sessions close (and are emitted exactly
  * once, append mode) when the watermark passes session end + gap.
  */
case class SessRow(driver_id: String, event_timestamp: java.sql.Timestamp,
                   fare: Double)

class SessionStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def r(drv: String, sec: Long, fare: Double) =
    SessRow(drv, new java.sql.Timestamp(1704067200000L + sec * 1000L), fare)

  test("sessions split on the 30-min gap and close under the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessRow]
    val q = MedallionStream.driverSessions(input.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .start()

    // two bursts 40 min apart → two sessions for DRV001
    input.addData(r("DRV001", 0, 10.0), r("DRV001", 60, 20.0),
      r("DRV001", 2460, 5.0))
    q.processAllAvailable()
    // watermark = 2460s - 10min = 1860s, exactly burst 1's session
    // end (60s + 30min) → burst 1 closes; burst 2 stays open
    assert(spark.table("sessions").count() === 1)

    // an event far in the future closes burst 2 (its own session
    // stays open: watermark 19400 < 20000 + 1800)
    input.addData(r("DRV002", 20000, 1.0))
    q.processAllAvailable()
    val closed = spark.table("sessions")
      .orderBy(col("session_start"))
      .collect()
    assert(closed.length === 2)
    assert(closed(0).getLong(3) === 2)                  // rides in burst 1
    assert(closed(0).getDouble(4) === 30.0)             // fare sum
    assert(closed(1).getLong(3) === 1)
    // session_end = last event + gap
    assert(closed(0).getTimestamp(1).getTime ===
      1704067200000L + 60 * 1000L + 30 * 60 * 1000L)
    q.stop()
  }

  test("batch mode computes the same sessions eagerly") {
    val df = Seq(r("DRV001", 0, 10.0), r("DRV001", 60, 20.0),
      r("DRV001", 2460, 5.0), r("DRV002", 20000, 1.0)).toDF()
    val sessions = MedallionStream.driverSessions(df).collect()
    assert(sessions.length === 3)
  }
}
