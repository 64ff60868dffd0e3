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
