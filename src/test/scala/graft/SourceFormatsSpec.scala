package graft

import org.apache.spark.sql.functions._

/** Source-format coverage beyond parquet: CSV and JSON round-trips
  * preserve the event schema and values (timestamps, doubles, JSON
  * payload strings) under explicit schemas — the batch counterparts
  * of the streaming JSON file source.
  */
class SourceFormatsSpec extends SparkTestBase {

  private lazy val events =
    SparkEntry.events(spark, "/root/testdata/sf0.001")

  test("kafkaRecords matches the Kafka producer-sink contract") {
    import org.apache.spark.sql.types._
    val recs = graft.sources.RideGenerator.kafkaRecords(
      graft.sources.RideGenerator.events(spark, 200L), topic = "rides_raw")
    // the kafka sink requires binary key/value and a topic column
    // key is non-nullable here (generated ids); the sink only requires
    // binary key/value + string topic
    assert(recs.schema === StructType(Seq(
      StructField("key", BinaryType, nullable = false),
      StructField("value", BinaryType, nullable = true),
      StructField("topic", StringType, nullable = false))))
    // values must round-trip as the bronze JSON payload
    val parsed = recs
      .select(org.apache.spark.sql.functions.col("value").cast("string").as("v"))
      .select(org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("v"),
        graft.model.Rides.rideSchema).as("r"))
      .filter(org.apache.spark.sql.functions.col("r.ride_id").isNotNull)
    assert(parsed.count() > 150) // all but the injected malformed slice
  }

  test("kafka-shaped records flow through bronze/silver unchanged") {
    import org.apache.spark.sql.functions._
    val evs = graft.sources.RideGenerator.events(spark, 500L)
    // consumer side of the seam: binary key/value (as the kafka source
    // yields) + the broker timestamp; bronzeProject's CAST(value AS
    // STRING) must recover the exact payload (no join on key — the
    // generator injects duplicate ride ids by design)
    val kafkaShaped = evs.select(col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"), col("timestamp"))
    val direct = graft.operators.Medallion.silverParse(
      graft.operators.Medallion.bronzeProject(evs))
    val viaKafka = graft.operators.Medallion.silverParse(
      graft.operators.Medallion.bronzeProject(kafkaShaped))
    assert(viaKafka.except(direct).count() === 0 &&
      direct.except(viaKafka).count() === 0)
    assert(viaKafka.count() === direct.count())
  }

  test("events reader adapts to all three physical ts encodings") {
    import org.apache.spark.sql.types.TimestampType
    // the driver's generator has shipped events.ts as TIMESTAMP(NANOS)
    // (→ LongType under nanosAsLong) and as timestamp[us]
    // isAdjustedToUTC=false (→ TIMESTAMP_NTZ); pin that every spelling
    // the reader claims to support normalizes to the same instants
    val canonical = events.orderBy("event_id")
    val variants = Seq(
      // nanos-long spelling: what a TIMESTAMP(NANOS) file surfaces as
      "nanos-long" -> events.withColumn("ts", expr("unix_micros(ts) * 1000")),
      // timestamp[us] isAdjustedToUTC=false
      "ntz" -> events.withColumn("ts", col("ts").cast("timestamp_ntz")),
      // timestamp with timezone: identity path
      "tz" -> events)
    variants.foreach { case (label, frame) =>
      val dir = tmpDir(s"events-$label")
      frame.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val back = SparkEntry.events(spark, dir)
      assert(back.schema("ts").dataType === TimestampType,
        s"$label: ts not normalized to TimestampType")
      val got = back.orderBy("event_id")
      assert(got.except(canonical).count() === 0 &&
        canonical.except(got).count() === 0,
        s"$label: instants diverge from canonical read")
    }
  }

  test("CSV round-trip with explicit schema preserves values") {
    val dir = tmpDir("csv")
    events.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(dir)
    val back = spark.read
      .schema(events.schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(dir)
    assert(back.count() === events.count())
    assert(back.except(events).count() === 0 &&
      events.except(back).count() === 0, "CSV round-trip lost data")
  }

  test("ORC round-trip preserves values (self-describing schema)") {
    val dir = tmpDir("orc")
    events.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.except(events).count() === 0 &&
      events.except(back).count() === 0, "ORC round-trip lost data")
  }

  test("Avro round-trip preserves values (self-describing schema)") {
    // the avro classes ship inside spark-sql here but the "avro"
    // shortname's DataSourceRegister service entry does not — address
    // the format by class name
    val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    val dir = tmpDir("avro")
    events.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.except(events).count() === 0 &&
      events.except(back).count() === 0, "Avro round-trip lost data")
  }

  test("JSON round-trip with explicit schema preserves values") {
    val dir = tmpDir("json")
    events.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(dir)
    val back = spark.read
      .schema(events.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(dir)
    assert(back.except(events).count() === 0 &&
      events.except(back).count() === 0, "JSON round-trip lost data")
  }
}
