package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, distributed synthetic ride-event generator
  * reproducing the reference producer's semantics
  * (/root/reference/src/kafka_rides_producer.py:53-108): ids, times,
  * fares, status, and the three adversarial injections that exercise
  * the hard paths downstream —
  *   10% suspicious (duration < 2 min ∧ fare > 300, :64-68),
  *    5% very-late events (event_timestamp 6–10 min early, :71-74),
  *    2% re-emitted ride_ids (duplicate/update, :77-78) —
  * plus a 1% malformed-JSON rate to exercise the silver parse-drop
  * path (02_silver_realtime_rides.py:47-48).
  *
  * Unlike the reference's single-process Python loop (~2–10 events/s),
  * this generator is a columnar expression pipeline over
  * `spark.range`: every field derives from seeded hashes of the row
  * id, so it is reproducible at any parallelism and generates millions
  * of events/s/core — the driver never sees a row.
  */
object RideGenerator {

  private def u(seed: Long, salt: Int): org.apache.spark.sql.Column =
    // uniform [0,1) from a salted 64-bit hash of the row id
    (pmod(xxhash64(lit(seed), lit(salt), col("id")), lit(1000000L))
      .cast("double") / 1000000.0)

  /** Raw Kafka-like records: (key, value, timestamp) where value is
    * the JSON payload (possibly malformed) and key = ride_id
    * (kafka_rides_producer.py:102-103).
    */
  def events(spark: SparkSession, n: Long, seed: Long = 42L,
             numPartitions: Int = 32,
             epochStart: Long = 1704067200L): DataFrame = {
    // Event stream advances ~3.33 events/s from a fixed epoch.
    val base = spark.range(0, n, 1, numPartitions).toDF()
      .withColumn("__epoch", lit(epochStart) + (col("id") * 3L) / 10L)
    record(base, seed, col("__epoch"))
  }

  /** Shared record construction: every field is a deterministic
    * expression over `col("id")` and the per-row epoch column.
    */
  private def record(base: DataFrame, seed: Long,
                     epoch: org.apache.spark.sql.Column): DataFrame = {
    val dupRoll = u(seed, 1)
    // 2% re-emission of a recent ride (1..50 back) — update/dup path
    val effId = when(dupRoll < 0.02 && col("id") > 50,
      col("id") - 1L - pmod(xxhash64(lit(seed), lit(2), col("id")), lit(50L)))
      .otherwise(col("id"))

    val suspicious = u(seed, 3) < 0.10
    val late = u(seed, 4) < 0.05
    val malformed = u(seed, 5) < 0.01

    val startSec = epoch - (u(seed, 6) * 300).cast("long")
    val durationSec = when(suspicious,
      (lit(30) + u(seed, 7) * 89).cast("long"))         // 30–119 s
      .otherwise((lit(60) + u(seed, 7) * 840).cast("long")) // 1–15 min
    val endSec = startSec + durationSec
    val fare = when(suspicious, round(lit(301.0) + u(seed, 8) * 1199.0, 2))
      .otherwise(round(lit(50.0) + u(seed, 8) * 950.0, 2))
    val status = element_at(
      array(lit("completed"), lit("cancelled"), lit("started")),
      (pmod(xxhash64(lit(seed), lit(9), col("id")), lit(3L)) + 1).cast("int"))
    val evtSec = when(late, endSec - (lit(360) + u(seed, 10) * 240).cast("long"))
      .otherwise(endSec - (u(seed, 10) * 120).cast("long") +
        (u(seed, 11) * 10).cast("long"))

    def iso(secs: org.apache.spark.sql.Column) =
      date_format(timestamp_seconds(secs), "yyyy-MM-dd'T'HH:mm:ss'Z'")

    val payload = to_json(struct(
      format_string("RID%05d", effId).as("ride_id"),
      format_string("DRV%03d",
        pmod(xxhash64(lit(seed), lit(12), col("id")), lit(100L)) + 1)
        .as("driver_id"),
      format_string("P%04d",
        pmod(xxhash64(lit(seed), lit(13), col("id")), lit(9000L)) + 1000)
        .as("passenger_id"),
      iso(startSec).as("start_time"),
      iso(endSec).as("end_time"),
      fare.as("fare"),
      status.as("status"),
      iso(evtSec).as("event_timestamp")))

    base.select(
      format_string("RID%05d", effId).as("key"),
      when(malformed, substring(payload, 1, 40)).otherwise(payload).as("value"),
      timestamp_seconds(evtSec + 1).as("timestamp"))
  }

  /** Live unbounded variant: the same event columns driven by Spark's
    * `rate` source (rowsPerSecond events/s, `value` playing the row
    * id) — a drop-in Kafka stand-in for long-running manual runs of
    * the medallion chain. Deterministic given the row id, like the
    * batch generator.
    */
  def streamingEvents(spark: SparkSession, rowsPerSecond: Int = 100,
                      seed: Long = 42L): DataFrame = {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .withColumnRenamed("value", "id")
    // The batch generator's exprs all key off col("id"), so they
    // apply unchanged; event time anchors to the rate source's clock.
    record(rate.withColumn("__epoch",
      unix_timestamp(col("timestamp"))), seed, col("__epoch"))
  }

  /** Write a generated batch as JSON files — the stand-in for the
    * Kafka topic, consumed by the streaming bronze query via Spark's
    * incremental file source (1-line swap to `format("kafka")` when
    * the connector jar is on the classpath).
    */
  def writeRaw(spark: SparkSession, dir: String, n: Long,
               seed: Long = 42L, files: Int = 8,
               epochStart: Long = 1704067200L): Unit =
    events(spark, n, seed, epochStart = epochStart).repartition(files)
      .write.mode("append").json(dir)

  /** Shape a generated frame into the EXACT Kafka producer-sink
    * contract (what `df.write.format("kafka")` consumes: binary
    * key/value plus a topic column). With the connector jar on the
    * classpath the producer is literally
    * `kafkaRecords(events(...), topic).write.format("kafka")
    * .option("kafka.bootstrap.servers", ...).save()`; here the shape
    * is tested (schema + value round-trip) without a broker.
    */
  def kafkaRecords(records: DataFrame,
                   topic: String = "rides_raw"): DataFrame =
    records.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit(topic).as("topic"))
}
