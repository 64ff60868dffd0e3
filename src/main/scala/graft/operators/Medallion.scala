package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Rides
import graft.functions.Hashing

/** The medallion transform stages (Bronze → Silver → Gold) as pure
  * `DataFrame => DataFrame` functions, shared verbatim between the
  * batch (oracle-checked) and streaming execution paths — the stream
  * is the same logical plan incrementalized by Catalyst.
  *
  * Reference semantics:
  *  - bronze projection: /root/reference/src/01_bronze_realtime_rides.py:76
  *  - silver parse/clean/derive: /root/reference/src/02_silver_realtime_rides.py:46-103
  *  - gold windowed aggregate: /root/reference/src/03_gold_realtime_rides.py:46-66
  */
object Medallion {

  /** Bronze stage: raw Kafka-like (key, value, timestamp) rows →
    * (raw_json_data, timestamp). `CAST(value AS STRING)` per
    * 01_bronze_realtime_rides.py:76.
    */
  def bronzeProject(raw: DataFrame): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS raw_json_data", "timestamp")

  /** Silver parse: JSON string → typed struct → flattened columns.
    * Malformed JSON yields a NULL struct (PERMISSIVE mode) and is
    * dropped (02_silver_realtime_rides.py:46-49).
    */
  def silverParse(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("value_str", col("raw_json_data").cast("string"))
      .withColumn("data", from_json(col("value_str"), Rides.rideSchema))
      .filter(col("data").isNotNull)
      .select(col("data.*"), col("timestamp"))

  /** Silver derive: trip duration from timestamp arithmetic (cast to
    * long = epoch seconds, 02:67) and a deterministic trip distance.
    *
    * The reference uses `round(rand()*20, 2)` (02:70) — a
    * nondeterministic dummy. For oracle-reproducible results we derive
    * the same [0, 20) 2-dp distribution from a hash of ride_id:
    * identical shape, deterministic, and portable SQL.
    */
  def silverDerive(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("trip_duration_seconds",
        col("end_time").cast("long") - col("start_time").cast("long"))
      .withColumn("trip_distance_km",
        Hashing.portableRound(pmod(Hashing.hash60(col("ride_id")), lit(2000))
          .cast("double") / 100.0, 2))

  /** Silver quality filter: the 7-term conjunction of
    * 02_silver_realtime_rides.py:71-79.
    */
  def silverClean(derived: DataFrame): DataFrame =
    derived.filter(
      col("ride_id").isNotNull &&
      col("driver_id").isNotNull &&
      col("event_timestamp").isNotNull &&
      col("fare").isNotNull &&
      col("trip_duration_seconds").isNotNull &&
      col("fare") >= 0 &&
      col("trip_duration_seconds") >= 0)

  /** Suspicious-ride flag: duration < 2 min AND fare > 300
    * (02_silver_realtime_rides.py:99-103; injection rule at
    * kafka_rides_producer.py:64-68).
    */
  def silverFlag(cleaned: DataFrame): DataFrame =
    cleaned.withColumn("is_suspicious",
      col("trip_duration_seconds") < 120 && col("fare") > 300)

  /** Stateful dedup on the reference's key (ride_id, event_timestamp)
    * (02:91). In streaming this is preceded by
    * `withWatermark(event_timestamp, 10 minutes)` (02:90) which bounds
    * the dedup state store; the batch path is the same operator
    * without state expiry.
    */
  def silverDedup(df: DataFrame, streaming: Boolean): DataFrame = {
    val base =
      if (streaming) df.withWatermark("event_timestamp", Rides.watermarkDelay)
      else df
    base.dropDuplicates("ride_id", "event_timestamp")
  }

  /** Update-collapsing dedup on ride_id ALONE, with bounded state.
    *
    * The producer's 2% "re-emitted ride" updates
    * (kafka_rides_producer.py:77-78) carry a NEW event_timestamp, so
    * the reference's (ride_id, event_timestamp) dedup (02:91) admits
    * them and the gold MERGE reconciles them later. This variant
    * collapses them at admission time instead: keep only the FIRST
    * event per ride_id seen within the watermark delay. A plain
    * `dropDuplicates("ride_id")` would do that with state that grows
    * forever (the key carries no event time, so nothing ever
    * expires — the classic unbounded-state trap at 100 TB ingest);
    * `dropDuplicatesWithinWatermark` guarantees dedup only for
    * duplicates within the delay and in exchange expires each key
    * once the watermark passes its first-seen time + delay.
    */
  def silverDedupByRide(df: DataFrame): DataFrame =
    df.withWatermark("event_timestamp", Rides.watermarkDelay)
      .dropDuplicatesWithinWatermark("ride_id")

  /** Oracle-reproducible batch dedup: same key as [[silverDedup]], but
    * `dropDuplicates` keeps an arbitrary first-encountered row — the
    * survivor depends on partitioning, so the result of the composed
    * pipeline is not comparable across engines when two rows share
    * (ride_id, event_timestamp) with different payloads. This variant
    * breaks ties with a total order over the remaining columns, making
    * the survivor deterministic at any parallelism. Shuffle shape is
    * identical (one hash-exchange on the dedup key); the per-key sort
    * is over duplicate groups of size ~1–2.
    */
  def silverDedupDeterministic(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ride_id"), col("event_timestamp"))
      .orderBy(col("start_time"), col("end_time"), col("fare"),
        col("status"), col("passenger_id"), col("driver_id"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Full silver stage: parse → derive → clean → dedup → flag,
    * emitting the 11-column silver schema in order.
    *
    * @param deterministicDedup use [[silverDedupDeterministic]] so the
    *        composed pipeline is bit-reproducible for oracle
    *        comparison (batch only).
    */
  def silverStage(bronze: DataFrame, streaming: Boolean = false,
                  deterministicDedup: Boolean = false): DataFrame = {
    val cleaned = silverClean(silverDerive(silverParse(bronze)))
    val deduped =
      if (deterministicDedup) silverDedupDeterministic(cleaned)
      else silverDedup(cleaned, streaming)
    val flagged = silverFlag(deduped)
    flagged.select(Rides.silverColumns.map(col): _*)
  }

  /** Gold stage: tumbling 1-hour event-time window × driver_id with
    * count / rounded avg fare / conditional suspicious count
    * (03_gold_realtime_rides.py:46-66).
    *
    * Scale note: this is a single hash-shuffle on
    * (window, driver_id); Catalyst plans partial (map-side) aggregation
    * before the exchange, so the shuffle carries one row per
    * (hour, driver) per input partition — at 100 TB the reduction is
    * ~(events per driver-hour per partition)×, and the key space
    * (drivers × hours) stays far below input cardinality.
    *
    * @param withProcessingTime include the nondeterministic
    *        `processing_time` audit column (03:57); disabled for
    *        oracle-compared output.
    */
  def goldAggregate(silver: DataFrame,
                    withProcessingTime: Boolean = false): DataFrame = {
    // avg fare via EXACT INTEGER CENTS: fares are 2-dp money, so
    // round(fare·100) recovers the exact cent value and a SUM of longs
    // is associative — the group average is bit-identical at any
    // parallelism and in any engine. A double `avg` is summation-
    // order-dependent in its last ulp, which flips the 2-dp rounding
    // for knife-edge groups (observed: one group in ~300 flipped
    // between two local runs purely from partial-agg merge order).
    val agg = silver
      .groupBy(window(col("event_timestamp"), Rides.goldWindow),
        col("driver_id"))
      .agg(
        count(col("ride_id")).as("total_rides_hourly"),
        sum(round(col("fare") * 100).cast("long")).as("fare_cents"),
        sum(when(col("is_suspicious") === true, 1).otherwise(0))
          .as("total_suspicious_rides_hourly"))
    val projected = agg.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("driver_id"),
      col("total_rides_hourly"),
      Hashing.portableRound(
        (col("fare_cents").cast("double") / 100.0) / col("total_rides_hourly"),
        2).as("avg_fare_hourly"),
      col("total_suspicious_rides_hourly"))
    if (withProcessingTime)
      projected.withColumn("processing_time", current_timestamp())
    else projected
  }
}
