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

  test("kafka source loads through the 1-line seam when the connector jar is present") {
    // conditionally enabled on the jar (skipped VISIBLY, not silently
    // absent): the day spark-sql-kafka-0-10 lands in /opt/spark/jars,
    // this proves the swap — format("kafka") resolves and its source
    // schema carries the key/value/timestamp columns bronzeProject
    // consumes. No broker needed: load() is lazy.
    val jars = Option(new java.io.File("/opt/spark/jars").listFiles())
      .getOrElse(Array.empty)
    assume(jars.exists(_.getName.startsWith("spark-sql-kafka")),
      "spark-sql-kafka-0-10 is absent from /opt/spark/jars")
    val kafka = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", "localhost:9092")
      .option("subscribe", "realtime_rides")
      .load()
    for (c <- Seq("key", "value", "timestamp"))
      assert(kafka.columns.contains(c), s"kafka source lacks $c")
  }

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
    import graft.sources.Tables
    // the driver's generator has shipped events.ts as TIMESTAMP(NANOS)
    // (→ LongType under nanosAsLong) and as timestamp[us]
    // isAdjustedToUTC=false (→ TIMESTAMP_NTZ); pin that every spelling
    // the reader claims to support normalizes to the same instants
    val canonical = events.orderBy("event_id")
    val variants = Seq(
      // timestamp[us] isAdjustedToUTC=false
      "ntz" -> events.withColumn("ts", col("ts").cast("timestamp_ntz")),
      // timestamp with timezone: identity path
      "tz" -> events)
    variants.foreach { case (label, frame) =>
      val dir = tmpDir(s"events-$label")
      frame.write.mode("overwrite").parquet(s"$dir/events.parquet")
      try {
        val back = SparkEntry.events(spark, dir)
        assert(back.schema("ts").dataType === TimestampType,
          s"$label: ts not normalized to TimestampType")
        val got = back.orderBy("event_id")
        assert(got.except(canonical).count() === 0 &&
          canonical.except(got).count() === 0,
          s"$label: instants diverge from canonical read")
      } finally spark.conf.unset(Tables.nanosAsLongKey)
    }
    // GENUINE TIMESTAMP(NANOS) (footer-annotated, the real driver
    // encoding): the reader must self-probe — first read fails on the
    // NANOS analysis error, the conf flips on, the footer confirms
    // the column is truly nanos, values floor to µs
    val dir = tmpDir("events-nanos")
    spark.conf.unset(Tables.nanosAsLongKey)
    NanosParquet.writeEvents(s"$dir/events.parquet",
      events.orderBy("event_id")
        .select(col("event_id"), expr("unix_micros(ts)").as("us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .collect().toSeq.map(r =>
          (r.getLong(0), r.getLong(1) * 1000L, r.getLong(2),
            r.getString(3), r.getDouble(4),
            Option(r.getString(5)).getOrElse("{}"))))
    try {
      val back = SparkEntry.events(spark, dir)
      assert(back.schema("ts").dataType === TimestampType,
        "nanos: ts not normalized to TimestampType")
      val got = back.orderBy("event_id")
        .select("event_id", "ts", "user_id", "event_type", "value")
      val want = canonical
        .select("event_id", "ts", "user_id", "event_type", "value")
      assert(got.except(want).count() === 0 &&
        want.except(got).count() === 0,
        "nanos: instants diverge from canonical read")
      assert(spark.conf.getOption(Tables.nanosAsLongKey).contains("true"),
        "probe must have flipped the session conf for nanos data")
    } finally spark.conf.unset(Tables.nanosAsLongKey)
  }

  test("reading micro/NTZ data leaves the nanosAsLong conf untouched") {
    import graft.sources.Tables
    // The r8 reader set nanosAsLong on EVERY events() call — a
    // session-global side effect that silently turned any later
    // genuinely-nanos read elsewhere into longs. The probe-based
    // reader must stay side-effect-free when the data doesn't need it.
    spark.conf.unset(Tables.nanosAsLongKey)
    SparkEntry.events(spark, "/root/testdata/sf0.001").limit(1).collect()
    assert(!spark.conf.getOption(Tables.nanosAsLongKey).contains("true"),
      "reading non-nanos events flipped the session conf on")
  }

  test("plain-int64 event-time without nanos context fails loudly") {
    import graft.sources.Tables
    // An int64 ts in a session that never needed nanosAsLong carries
    // no epoch unit (ns? µs? ms?) — guessing one would corrupt every
    // window silently; the reader must refuse and name the column.
    spark.conf.unset(Tables.nanosAsLongKey)
    val dir = tmpDir("events-plainlong")
    events.withColumn("ts", expr("unix_micros(ts)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      SparkEntry.events(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"), e.getMessage)
  }

  test("plain-int64 event-time fails loudly even in a nanos-conf session") {
    import graft.sources.Tables
    // the session-sticky trap: after one genuinely-nanos table flips
    // nanosAsLong on, a plain int64 in a DIFFERENT table also
    // surfaces as LongType — trusting the conf would silently divide
    // its instants by 1000. Nanos-ness is per FILE (footer logical
    // type), so the refusal must be order-independent of which
    // tables were read first.
    val dir = tmpDir("events-plainlong-sticky")
    events.withColumn("ts", expr("unix_micros(ts)"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.conf.set(Tables.nanosAsLongKey, "true")
    try {
      val e = intercept[IllegalStateException] {
        SparkEntry.events(spark, dir)
      }
      assert(e.getMessage.contains("events.ts"), e.getMessage)
      assert(e.getMessage.contains("epoch unit"), e.getMessage)
    } finally spark.conf.unset(Tables.nanosAsLongKey)
  }

  test("documents/embeddings/orders/customer readers survive encoding drift") {
    import graft.sources.Tables
    import org.apache.spark.sql.types._
    val sf = "/root/testdata/sf0.001"

    // documents: int32 ids/counts (a generator flip from int64)
    val docs = Tables.read(spark, sf, "documents")
    val dDir = tmpDir("docs-int32")
    docs.withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .write.mode("overwrite").parquet(s"$dDir/documents.parquet")
    val docsBack = Tables.read(spark, dDir, "documents")
    // pass-through (no widening cast — the oracle reads the same file)
    assert(docsBack.schema("doc_id").dataType === IntegerType)
    assert(docsBack.agg(sum(length(col("text")))).head.getLong(0) ===
      docs.agg(sum(length(col("text")))).head.getLong(0))

    // embeddings: float64 vectors + int64 labels
    val emb = Tables.read(spark, sf, "embeddings")
    val eDir = tmpDir("emb-f64")
    emb.withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .withColumn("label", col("label").cast(LongType))
      .write.mode("overwrite").parquet(s"$eDir/embeddings.parquet")
    val embBack = Tables.read(spark, eDir, "embeddings")
    assert(embBack.schema("embedding").dataType === ArrayType(DoubleType, true))
    // downstream vector ops accept both element widths
    val c = embBack.limit(10).select(
      graft.functions.Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).head
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-6 &&
      math.abs(c.getDouble(1) - 1.0) < 1e-6)

    // orders: NTZ and DATE order-date spellings
    val ords = Tables.read(spark, sf, "orders")
    val oDir = tmpDir("orders-ntz")
    ords.withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$oDir/orders.parquet")
    assert(Tables.read(spark, oDir, "orders")
      .schema("o_orderdate").dataType === TimestampType)
    val o2Dir = tmpDir("orders-date")
    ords.withColumn("o_orderdate", col("o_orderdate").cast(DateType))
      .write.mode("overwrite").parquet(s"$o2Dir/orders.parquet")
    // date stays date: every other reader of the file sees dates
    assert(Tables.read(spark, o2Dir, "orders")
      .schema("o_orderdate").dataType === DateType)

    // customer: money as decimal → normalized to double (decimal
    // arithmetic diverges from the double arithmetic queries use)
    val cust = Tables.read(spark, sf, "customer")
    val cDir = tmpDir("cust-dec")
    cust.withColumn("c_acctbal", col("c_acctbal").cast(DecimalType(12, 2)))
      .write.mode("overwrite").parquet(s"$cDir/customer.parquet")
    assert(Tables.read(spark, cDir, "customer")
      .schema("c_acctbal").dataType === DoubleType)

    // a column that can't be adapted names itself on the way down
    val badDir = tmpDir("docs-bad")
    docs.withColumn("text", lit(42))
      .write.mode("overwrite").parquet(s"$badDir/documents.parquet")
    val err = intercept[IllegalStateException] {
      Tables.read(spark, badDir, "documents")
    }
    assert(err.getMessage.contains("documents.text"), err.getMessage)
    // a declared column gone missing is named too
    val missDir = tmpDir("docs-miss")
    docs.drop("lang")
      .write.mode("overwrite").parquet(s"$missDir/documents.parquet")
    val err2 = intercept[IllegalStateException] {
      Tables.read(spark, missDir, "documents")
    }
    assert(err2.getMessage.contains("documents.lang"), err2.getMessage)
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
