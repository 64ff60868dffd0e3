package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream inner join with watermarks and a time-range
  * condition — the last streaming operator family: both sides are
  * unbounded, state is bounded by the watermark + interval bound.
  * Scenario: match each ride-start event to its driver's dispatch
  * event issued at most 10 minutes earlier.
  */
case class Dispatch(driver_id: String, dispatch_time: java.sql.Timestamp)
case class RideStart(driver_id2: String, start_time: java.sql.Timestamp,
                     fare: Double)

class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000L)

  test("rides join their dispatch within the 10-minute window") {
    implicit val sqlCtx = spark.sqlContext
    val dispatches = MemoryStream[Dispatch]
    val rides = MemoryStream[RideStart]

    val joined = dispatches.toDF()
      .withWatermark("dispatch_time", "10 minutes")
      .join(
        rides.toDF().withWatermark("start_time", "10 minutes"),
        expr("""driver_id = driver_id2 AND
                start_time >= dispatch_time AND
                start_time <= dispatch_time + INTERVAL 10 MINUTES"""))
      .select(col("driver_id"), col("dispatch_time"), col("start_time"),
        col("fare"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("ssjoin-ckpt"))
      .start()

    // dispatch at t=0; ride starts at t=120 (within) and t=900 (outside)
    dispatches.addData(Dispatch("DRV001", ts(0)))
    rides.addData(RideStart("DRV001", ts(120), 50.0),
      RideStart("DRV001", ts(900), 70.0))
    // a second driver with no dispatch → never joins
    rides.addData(RideStart("DRV002", ts(60), 10.0))
    q.processAllAvailable()

    val got = spark.table("ss_join").collect()
      .map(r => (r.getString(0), r.getTimestamp(2).getTime, r.getDouble(3)))
    assert(got.toSeq === Seq(("DRV001", ts(120).getTime, 50.0)),
      s"got: ${got.mkString(",")}")
    q.stop()
  }

  test("stream-static broadcast join enriches the stream per batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.broadcast
    val rides = MemoryStream[RideStart]
    // static dimension: driver home region (re-read per micro-batch,
    // broadcast — the standard streaming enrichment pattern)
    val regions = Seq(("DRV001", "NORTH"), ("DRV002", "SOUTH"))
      .toDF("driver_id", "region")
    val enriched = rides.toDF()
      .join(broadcast(regions),
        col("driver_id2") === col("driver_id"), "left_outer")
      .select(col("driver_id2"), col("region"), col("fare"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpDir("ssb-ckpt"))
      .start()
    rides.addData(RideStart("DRV001", ts(0), 10.0),
      RideStart("DRV003", ts(1), 20.0))
    q.processAllAvailable()
    val got = spark.table("enriched").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map("DRV001" -> Some("NORTH"), "DRV003" -> None))
    q.stop()
  }
}
