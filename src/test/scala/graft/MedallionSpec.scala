package graft

import org.apache.spark.sql.functions._
import graft.operators.Medallion
import graft.sources.RideGenerator

/** Batch semantics of the medallion stages over the seeded generator —
  * the paths the DuckDB oracle cannot see (generated input).
  */
class MedallionSpec extends SparkTestBase {

  private val n = 20000L
  private lazy val raw = RideGenerator.events(spark, n).cache()
  private lazy val silver =
    Medallion.silverStage(Medallion.bronzeProject(raw)).cache()

  test("generator reproduces the reference anomaly rates") {
    // malformed ~1%: truncated JSON parses to an all-null struct
    // (Spark 4 PERMISSIVE), dropped by the quality filter on ride_id
    val parsed = Medallion.silverParse(Medallion.bronzeProject(raw))
    val malformedRate =
      parsed.filter(col("ride_id").isNull).count().toDouble / n
    assert(malformedRate > 0.005 && malformedRate < 0.02,
      s"malformed rate $malformedRate")

    // flagged ≈ 10% injected + ~5% of normal rides that happen to
    // satisfy duration<120 ∧ fare>300 (the same overlap exists in the
    // reference producer: duration 1–15 min × fare 50–1000 uniform)
    val s = silver.filter(col("is_suspicious")).count().toDouble /
      silver.count()
    assert(s > 0.11 && s < 0.19, s"suspicious rate $s")

    // late ~5%: event_timestamp more than 5 min before end_time
    val late = silver.filter(
      col("end_time").cast("long") - col("event_timestamp").cast("long") > 300)
      .count().toDouble / silver.count()
    assert(late > 0.03 && late < 0.07, s"late rate $late")

    // duplicates ~2%: re-emitted ride_ids
    val ids = silver.select(col("ride_id")).count().toDouble
    val distinctIds = silver.select(col("ride_id")).distinct().count()
    val dupRate = 1.0 - distinctIds / ids
    assert(dupRate > 0.01 && dupRate < 0.03, s"dup rate $dupRate")
  }

  test("silver enforces the quality invariants") {
    assert(silver.filter(col("ride_id").isNull || col("driver_id").isNull ||
      col("event_timestamp").isNull || col("fare").isNull).count() === 0)
    assert(silver.filter(col("fare") < 0 ||
      col("trip_duration_seconds") < 0).count() === 0)
    // dedup key uniqueness (02_silver_realtime_rides.py:91)
    val rows = silver.count()
    val keys = silver.select(col("ride_id"), col("event_timestamp"))
      .distinct().count()
    assert(rows === keys, s"silver not unique on dedup key: $rows vs $keys")
    // distance in [0, 20) with 2 dp
    val badDist = silver.filter(col("trip_distance_km") < 0 ||
      col("trip_distance_km") >= 20).count()
    assert(badDist === 0)
  }

  test("gold aggregate matches a manual recomputation for one group") {
    val gold = Medallion.goldAggregate(silver)
    val top = gold.orderBy(col("total_rides_hourly").desc).first()
    val ws = top.getTimestamp(0); val drv = top.getString(2)
    val manual = silver.filter(
      col("driver_id") === drv &&
      col("event_timestamp") >= lit(ws) &&
      col("event_timestamp") < lit(new java.sql.Timestamp(
        ws.getTime + 3600 * 1000L)))
    assert(manual.count() === top.getLong(3))
    val expAvg = BigDecimal(
      manual.agg(avg(col("fare"))).first().getDouble(0))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(expAvg - top.getDouble(4)) < 1e-9)
    assert(manual.filter(col("is_suspicious")).count() === top.getLong(5))
  }

  test("gold key is unique (window_start, window_end, driver_id)") {
    val gold = Medallion.goldAggregate(silver)
    assert(gold.count() ===
      gold.select(col("window_start"), col("window_end"), col("driver_id"))
        .distinct().count())
  }
}
