package graft.model

import org.apache.spark.sql.types._

/** Data model of the ride-event pipeline.
  *
  * Mirrors the reference's explicitly declared schemas:
  *  - raw event JSON fields: /root/reference/src/kafka_rides_producer.py:80-89
  *  - silver parse schema (8 nullable fields):
  *    /root/reference/src/02_silver_realtime_rides.py:25-34
  *  - gold DDL: /root/reference/src/03_gold_realtime_rides.py:77-87
  */
object Rides {

  /** The 8-field event schema used by `from_json` in the silver stage
    * (02_silver_realtime_rides.py:25-34). All nullable; ISO-8601 `...Z`
    * strings parse to UTC timestamps under
    * `spark.sql.session.timeZone=UTC`.
    */
  val rideSchema: StructType = StructType(Seq(
    StructField("ride_id", StringType),
    StructField("driver_id", StringType),
    StructField("passenger_id", StringType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("fare", DoubleType),
    StructField("status", StringType),
    StructField("event_timestamp", TimestampType)
  ))

  /** Bronze landing schema (01_bronze_realtime_rides.py:76): the raw
    * payload string plus the ingestion timestamp.
    */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("raw_json_data", StringType),
    StructField("timestamp", TimestampType)
  ))

  /** Columns of the silver table, in order
    * (02_silver_realtime_rides.py:57-70, 99-103).
    */
  val silverColumns: Seq[String] = Seq(
    "ride_id", "driver_id", "passenger_id", "start_time", "end_time",
    "fare", "status", "event_timestamp",
    "trip_duration_seconds", "trip_distance_km", "is_suspicious")

  /** Gold upsert key (03_gold_realtime_rides.py:104-112 MERGE condition). */
  val goldKey: Seq[String] = Seq("window_start", "window_end", "driver_id")

  /** Watermark delay bounding silver dedup state
    * (02_silver_realtime_rides.py:90).
    */
  val watermarkDelay: String = "10 minutes"

  /** Tumbling-window size of the gold aggregate
    * (03_gold_realtime_rides.py:48).
    */
  val goldWindow: String = "1 hour"
}
