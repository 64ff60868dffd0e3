package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Medallion

/** `silverDedupByRide` (dropDuplicatesWithinWatermark): updates of the
  * same ride_id with DIFFERENT event timestamps collapse to the first
  * event when they arrive within the watermark delay, and — the
  * bounded-state contract — a key re-appearing long after the
  * watermark passed it is admitted again because its state expired.
  */
case class DupRow(ride_id: String, event_timestamp: java.sql.Timestamp,
                  fare: Double)

class WithinWatermarkDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def r(id: String, sec: Long, fare: Double) =
    DupRow(id, new java.sql.Timestamp(1704067200000L + sec * 1000L), fare)

  test("updates within the delay collapse; expired keys re-admit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DupRow]
    val q = Medallion.silverDedupByRide(input.toDF())
      .writeStream.format("memory").queryName("dd_ww")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("ddww-ckpt"))
      .start()

    // RID1 then a re-emitted update 60 s later (new event_timestamp —
    // the case the reference's (ride_id, event_timestamp) dedup admits)
    input.addData(r("RID1", 0, 100.0), r("RID1", 60, 999.0))
    q.processAllAvailable()
    val first = spark.table("dd_ww").collect()
    assert(first.length === 1, s"update not collapsed: ${first.toSeq}")
    assert(first(0).getDouble(2) === 100.0, "survivor is not the first event")

    // advance the watermark far past RID1's expiry (10 min delay):
    // watermark moves to ~3600s - 600s = 3000s >> 60s + 600s
    input.addData(r("RID2", 3600, 1.0))
    q.processAllAvailable()
    // RID1 re-appears: its state expired, so it is admitted again —
    // the price of bounded state, and the documented contract
    input.addData(r("RID1", 3700, 50.0))
    q.processAllAvailable()
    val all = spark.table("dd_ww").collect()
    assert(all.length === 3, s"expected re-admission after expiry: ${all.toSeq}")
    q.stop()
  }
}
