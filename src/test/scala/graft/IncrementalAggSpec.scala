package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, ParquetUpsertSink}

/** Incremental view maintenance over the change feed: the maintained
  * aggregate must equal a full recompute after any mix of inserts,
  * updates, and deletes — including keys entering and leaving the
  * view — without rescanning the table.
  */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  // sink keyed by (window, driver); the VIEW aggregates coarser — per
  // driver across windows — which is where maintaining an aggregate
  // is meaningful (the sink's own key has one row per key by
  // construction). Integer-valued doubles keep FP addition exact, so
  // equality against recompute is strict.
  private val keys = Seq("window_start", "driver_id")

  private def rows(xs: (String, String, Long, Double)*) =
    xs.toDF("window_start", "driver_id", "total", "fare")

  private def recompute(sink: ParquetUpsertSink) =
    IncrementalAgg.view(sink.read(spark), Seq("driver_id"), Seq("fare"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("advance ≡ recompute across inserts, updates, deletes") {
    val dir = tmpDir("incagg") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "A", 1L, 20.0),
      ("h1", "B", 1L, 5.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg
      .view(sink.readVersion(spark, v0), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    assert(asMap(view0) === Map("A" -> ((2L, 30.0)), "B" -> ((1L, 5.0))))

    // update (h1,A): 10→40; insert (h3,C); delete B entirely
    sink.upsert(spark, rows(
      ("h1", "A", 2L, 40.0), ("h3", "C", 1L, 7.0)), batchId = 1)
    sink.delete(spark, col("driver_id") === "B", batchId = 2)

    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    // the update must carry BOTH images — retraction needs the old one
    assert(feed.filter(col("_change_type") === "update_preimage")
      .count() === 1)
    val advanced = IncrementalAgg
      .advance(view0, feed, Seq("driver_id"), Seq("fare"))
    assert(asMap(advanced) === asMap(recompute(sink)),
      "maintained view diverged from recompute")
    // B left the view entirely (count reached zero)
    assert(asMap(advanced) === Map("A" -> ((2L, 60.0)), "C" -> ((1L, 7.0))))
  }

  test("all-NULL measure keys: advance preserves SQL's NULL sum " +
      "(never 0.0) — including a key NULLED by retraction") {
    val dir = tmpDir("incagg") + "/nullsum"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    def nrows(xs: (String, String, Long, Option[Double])*) =
      xs.toDF("window_start", "driver_id", "total", "fare")
    // D1's fares are all NULL from the start; D2 has one real fare
    sink.upsert(spark, nrows(
      ("h1", "D1", 1L, None), ("h2", "D1", 1L, None),
      ("h1", "D2", 1L, Some(5.0)), ("h2", "D2", 1L, None)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg
      .view(sink.readVersion(spark, v0), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    def asNMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("driver_id"), col(IncrementalAgg.countCol),
        col("sum_fare")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(asNMap(view0) ===
      Map("D1" -> ((2L, None)), "D2" -> ((2L, Some(5.0)))),
      "built view must carry SQL's NULL sum for an all-NULL key")
    // feed: one more NULL row for D1 (stays all-NULL), and DELETE
    // D2's only non-null row — D2 becomes all-NULL via retraction,
    // the case a sum-only state cannot distinguish from 0.0
    sink.upsert(spark, nrows(("h3", "D1", 1L, None)), batchId = 1)
    sink.delete(spark,
      col("window_start") === "h1" && col("driver_id") === "D2",
      batchId = 2)
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg
      .advance(view0, feed, Seq("driver_id"), Seq("fare"))
    assert(asNMap(advanced) === asNMap(recompute(sink)),
      "advanced NULL-sum state diverged from recompute")
    assert(asNMap(advanced) ===
      Map("D1" -> ((3L, None)), "D2" -> ((1L, None))))
  }

  test("global rollup (keys = Nil): view builds and advance maintains " +
      "the single-row aggregate") {
    val dir = tmpDir("incagg") + "/global"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "B", 1L, 20.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg
      .view(sink.readVersion(spark, v0), Seq.empty, Seq("fare"))
      .localCheckpoint(true)
    assert(view0.count() === 1L &&
      view0.select(col("sum_fare")).first().getDouble(0) === 30.0)
    sink.upsert(spark, rows(("h3", "C", 1L, 12.0)), batchId = 1)
    sink.delete(spark, col("driver_id") === "A", batchId = 2)
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg
      .advance(view0, feed, Seq.empty, Seq("fare"))
    val rec = IncrementalAgg.view(sink.read(spark), Seq.empty, Seq("fare"))
    assert(advanced.select(col(IncrementalAgg.countCol), col("sum_fare"))
      .first().toString ===
      rec.select(col(IncrementalAgg.countCol), col("sum_fare"))
        .first().toString,
      "global-rollup advance diverged from recompute")
  }

  test("advance chains: view maintained across two feed windows") {
    val dir = tmpDir("incagg2") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 8)
    sink.upsert(spark, rows(("h1", "A", 1L, 3.0)), batchId = 0)
    var viewV = sink.currentVersion(spark)
    var view = IncrementalAgg
      .view(sink.readVersion(spark, viewV), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    // window 1: new driver + update
    sink.upsert(spark,
      rows(("h1", "A", 1L, 4.0), ("h1", "B", 1L, 9.0)), batchId = 1)
    var cur = sink.currentVersion(spark)
    view = IncrementalAgg.advance(view,
      sink.changeFeed(spark, viewV, cur, withPreimages = true),
      Seq("driver_id"), Seq("fare")).localCheckpoint(true)
    viewV = cur
    // window 2: delete the original driver
    sink.delete(spark, col("driver_id") === "A", batchId = 2)
    cur = sink.currentVersion(spark)
    view = IncrementalAgg.advance(view,
      sink.changeFeed(spark, viewV, cur, withPreimages = true),
      Seq("driver_id"), Seq("fare"))
    assert(asMap(view) === asMap(recompute(sink)))
    assert(asMap(view) === Map("B" -> ((1L, 9.0))))
  }

  test("streaming gold feed drives the maintained view end to end") {
    // the operator composed with the real streaming path: medallion
    // drain populates the gold sink, the view is built once, then a
    // second streaming wave + an upstream retraction advance it
    // through one CDC window — equal to recompute, no table rescan
    import graft.streaming.MedallionStream
    import graft.sources.RideGenerator
    import graft.model.Rides
    val root = tmpDir("incaggstream")
    val p = MedallionStream.Paths(s"$root/raw", s"$root/bronze",
      s"$root/silver", s"$root/gold", s"$root/ckpt")
    RideGenerator.writeRaw(spark, p.raw, 3000L)
    MedallionStream.runDrain(spark, p, goldRetainVersions = 6)
    val sink = new ParquetUpsertSink(p.gold, Rides.goldKey,
      retainVersions = 6)
    val v1 = sink.currentVersion(spark)
    val groupKeys = Seq("driver_id")
    val sums = Seq("total_rides_hourly")
    val view1 = IncrementalAgg.view(
      sink.readVersion(spark, v1), groupKeys, sums).localCheckpoint(true)

    RideGenerator.writeRaw(spark, p.raw, 1500L, seed = 13L,
      epochStart = 1704067200L + 7200L)
    MedallionStream.runDrain(spark, p, goldRetainVersions = 6)
    val victim = sink.read(spark).select("driver_id").as[String].head()
    sink.delete(spark, col("driver_id") === victim, batchId = -1)

    val feed = sink.changeFeed(spark, v1, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg.advance(view1, feed, groupKeys, sums)
    val full = IncrementalAgg.view(sink.read(spark), groupKeys, sums)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(advanced) === m(full),
      "streaming-fed maintained view diverged from recompute")
    assert(!m(advanced).contains(victim),
      s"retracted driver $victim must leave the maintained view")
  }

  test("min/max view: base-assisted repair only when an extremum is retracted") {
    val dir = tmpDir("incaggmm") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 8)
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "A", 1L, 30.0), ("h3", "A", 1L, 20.0),
      ("h1", "B", 1L, 5.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    def mm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val view0 = IncrementalAgg.minMaxView(
      sink.readVersion(spark, v0), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    assert(mm(view0) === Map(
      "A" -> ((3L, 10.0, 30.0)), "B" -> ((1L, 5.0, 5.0))))

    // delete A's MINIMUM row (damaged: repair must surface 20.0),
    // update A's max upward (insert side improves, no repair), new
    // driver C, and B leaves entirely
    sink.upsert(spark, rows(
      ("h2", "A", 2L, 50.0), ("h4", "C", 1L, 7.0)), batchId = 1)
    sink.delete(spark,
      col("window_start") === "h1" && col("driver_id").isin("A", "B"),
      batchId = 2)
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg.advanceMinMax(view0, feed,
      sink.read(spark), Seq("driver_id"), Seq("fare"))
    val full = IncrementalAgg.minMaxView(
      sink.read(spark), Seq("driver_id"), Seq("fare"))
    assert(mm(advanced) === mm(full),
      "maintained min/max diverged from recompute")
    assert(mm(advanced) === Map(
      "A" -> ((2L, 20.0, 50.0)), "C" -> ((1L, 7.0, 7.0))))
  }

  test("min/max: retracting a non-extremal row needs no repair and stays exact") {
    val dir = tmpDir("incaggmm2") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 8)
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "A", 1L, 20.0), ("h3", "A", 1L, 30.0)),
      batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg.minMaxView(
      sink.readVersion(spark, v0), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    sink.delete(spark, col("window_start") === "h2", batchId = 1) // middle row
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg.advanceMinMax(view0, feed,
      sink.read(spark), Seq("driver_id"), Seq("fare"))
    val full = IncrementalAgg.minMaxView(
      sink.read(spark), Seq("driver_id"), Seq("fare"))
    assert(advanced.collect().toSet === full.collect().toSet)
  }

  test("distinct state: advance ≡ recompute across value shifts, deletes, null values") {
    val dir = tmpDir("incdst") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "A", 1L, 20.0), ("h3", "A", 1L, 10.0),
      ("h1", "B", 1L, 5.0), ("h2", "B", 1L, 5.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val state0 = IncrementalAgg.distinctState(
      sink.readVersion(spark, v0), Seq("driver_id"), "fare")
      .localCheckpoint(true)
    // A sees {10, 20} (10 twice-witnessed); B sees {5} twice-witnessed
    def counts(st: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.readDistinct(st, Seq("driver_id"), "fare")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(state0) === Map("A" -> 2L, "B" -> 1L))

    // value shift (h1,A): 10→30 (old value keeps its other witness);
    // (h2,B): 5→5 (no-op for distinctness); delete h3 (10 loses its
    // last A-witness only if h1 moved — it did, so 10 must drop)
    sink.upsert(spark, rows(
      ("h1", "A", 2L, 30.0), ("h2", "B", 2L, 5.0)), batchId = 1)
    sink.delete(spark, col("window_start") === "h3", batchId = 2)
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val state1 = IncrementalAgg.advanceDistinct(
      state0, feed, Seq("driver_id"), "fare")
    val recomputed = IncrementalAgg.distinctState(
      sink.read(spark), Seq("driver_id"), "fare")
    assert(counts(state1) === counts(recomputed),
      "maintained distinct state diverged from recompute")
    assert(counts(state1) === Map("A" -> 2L, "B" -> 1L)) // A: {20, 30}

    // multiplicities themselves must match (not just the counts)
    def multMap(st: org.apache.spark.sql.DataFrame) = st.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(multMap(state1.select(col("driver_id"), col("fare"),
        col(IncrementalAgg.multCol))) ===
      multMap(recomputed.select(col("driver_id"), col("fare"),
        col(IncrementalAgg.multCol))))
  }

  test("distinct state ignores null values like SQL COUNT(DISTINCT)") {
    val dir = tmpDir("incdst2") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    val withNull = Seq(
      ("h1", "A", 1L, Some(10.0)), ("h2", "A", 1L, None),
      ("h1", "B", 1L, None))
      .toDF("window_start", "driver_id", "total", "fare")
    sink.upsert(spark, withNull, batchId = 0)
    val v0 = sink.currentVersion(spark)
    val state0 = IncrementalAgg.distinctState(
      sink.readVersion(spark, v0), Seq("driver_id"), "fare")
      .localCheckpoint(true)
    // B has only a null value: absent from the state entirely
    assert(state0.filter(col("driver_id") === "B").count() === 0)
    // a null→value update ADDS a witness; value→null RETRACTS one
    sink.upsert(spark, Seq(("h2", "A", 2L, Some(20.0)),
        ("h1", "A", 2L, Option.empty[Double]))
      .toDF("window_start", "driver_id", "total", "fare"), batchId = 1)
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val state1 = IncrementalAgg.advanceDistinct(
      state0, feed, Seq("driver_id"), "fare")
    val rec = IncrementalAgg.distinctState(
      sink.read(spark), Seq("driver_id"), "fare")
    assert(state1.collect().map(_.toString).sorted.toSeq ===
      rec.collect().map(_.toString).sorted.toSeq)
  }

  test("distinct advance refuses a post-image-only feed") {
    val dir = tmpDir("incdst3") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    sink.upsert(spark, rows(("h1", "A", 1L, 1.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val state0 = IncrementalAgg.distinctState(
      sink.readVersion(spark, v0), Seq("driver_id"), "fare")
    sink.upsert(spark, rows(("h1", "A", 2L, 2.0)), batchId = 1)
    val bare = sink.changeFeed(spark, v0, sink.currentVersion(spark))
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.advanceDistinct(state0, bare, Seq("driver_id"), "fare")
    }
    assert(e.getMessage.contains("pre-image"))
  }

  test("feed without _change_type is refused") {
    val v = IncrementalAgg.view(rows(("h1", "A", 1L, 1.0)),
      Seq("driver_id"), Seq("fare"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.advance(v, rows(("h1", "A", 1L, 2.0)),
        Seq("driver_id"), Seq("fare"))
    }
  }

  test("post-image-only feed (two-arg changeFeed) is refused, marked feed survives persistence") {
    // the silent-divergence trap: a feed without pre-images passes a
    // bare _change_type-exists check but inflates sums — updates add
    // with no retraction. The feed must be SELF-DESCRIBING: only the
    // withPreimages=true path stamps the marker advance() requires.
    val dir = tmpDir("incaggmark") + "/t"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    sink.upsert(spark, rows(("h1", "A", 1L, 10.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg
      .view(sink.readVersion(spark, v0), Seq("driver_id"), Seq("fare"))
      .localCheckpoint(true)
    sink.upsert(spark, rows(("h1", "A", 2L, 40.0)), batchId = 1)
    val cur = sink.currentVersion(spark)
    val bare = sink.changeFeed(spark, v0, cur) // NO pre-images
    assert(bare.columns.contains("_change_type"))
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.advance(view0, bare, Seq("driver_id"), Seq("fare"))
    }
    assert(e.getMessage.contains("withPreimages"))
    // the marker must survive the deployment shape: materialize the
    // feed once (parquet), advance many views from the file later
    val marked = sink.changeFeed(spark, v0, cur, withPreimages = true)
    val feedPath = tmpDir("incaggmark") + "/feed"
    marked.write.mode("overwrite").parquet(feedPath)
    val advanced = IncrementalAgg.advance(view0,
      spark.read.parquet(feedPath)
        .filter(col("_change_type").isNotNull), // derivation keeps marker
      Seq("driver_id"), Seq("fare"))
    assert(asMap(advanced) === asMap(recompute(sink)))
  }

  test("NULL group keys advance as ONE group (SQL GROUP BY semantics), " +
      "across sums, distinct counts and min/max repair") {
    val dir = tmpDir("incagg") + "/nullkey"
    val sink = new ParquetUpsertSink(dir, keys, retainVersions = 6)
    // group column: NULL for driver A/B, "g1" for the rest — the view
    // key the advance joins on is nullable, where a null-unsafe join
    // would split the NULL group into prev-state + delta twins
    def grouped(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("g",
        when(col("driver_id").isin("A", "B"), lit(null).cast("string"))
          .otherwise(lit("g1")))
    def key(r: org.apache.spark.sql.Row): Option[String] =
      Option(r.getString(0))
    sink.upsert(spark, rows(
      ("h1", "A", 1L, 10.0), ("h2", "B", 1L, 20.0),
      ("h1", "C", 1L, 5.0)), batchId = 0)
    val v0 = sink.currentVersion(spark)
    val view0 = IncrementalAgg.view(
      grouped(sink.readVersion(spark, v0)), Seq("g"), Seq("fare"))
      .localCheckpoint(true)
    val mm0 = IncrementalAgg.minMaxView(
      grouped(sink.readVersion(spark, v0)), Seq("g"), Seq("fare"))
      .localCheckpoint(true)
    val ds0 = IncrementalAgg.distinctState(
      grouped(sink.readVersion(spark, v0)), Seq("g"), "driver_id")
      .localCheckpoint(true)
    // update inside the null group (A: 10→40), delete its extremum
    // holder (B, fare 20 = max), insert into it (D)
    sink.upsert(spark, rows(
      ("h1", "A", 2L, 40.0), ("h4", "D", 1L, 1.0)), batchId = 1)
    sink.delete(spark, col("driver_id") === "B", batchId = 2)
    // D must land in the null group on BOTH feed and recompute sides
    def g2(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("g",
        when(col("driver_id").isin("A", "B", "D"),
          lit(null).cast("string")).otherwise(lit("g1")))
    val feed = sink.changeFeed(spark, v0, sink.currentVersion(spark),
      withPreimages = true)
    val advanced = IncrementalAgg.advance(view0, g2(feed), Seq("g"),
      Seq("fare"))
    val full = IncrementalAgg.view(g2(sink.read(spark)), Seq("g"),
      Seq("fare"))
    def sums(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => key(r) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(sums(advanced) === sums(full))
    assert(sums(advanced).contains(None), "null group must survive")
    assert(sums(advanced)(None) === ((2L, 41.0)))
    // min/max: B held the null group's max — base-assisted repair must
    // find the null-keyed rows (null-safe semi-join)
    val mmAdv = IncrementalAgg.advanceMinMax(mm0, g2(feed),
      g2(sink.read(spark)), Seq("g"), Seq("fare"))
    val mmFull = IncrementalAgg.minMaxView(g2(sink.read(spark)),
      Seq("g"), Seq("fare"))
    def mm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => key(r) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(mm(mmAdv) === mm(mmFull))
    assert(mm(mmAdv)(None) === ((2L, 1.0, 40.0)))
    // distinct: the null group's live distinct drivers are {A, D}
    val dsAdv = IncrementalAgg.advanceDistinct(ds0, g2(feed), Seq("g"),
      "driver_id")
    val cnt = IncrementalAgg.readDistinct(dsAdv, Seq("g"), "driver_id")
      .collect().map(r => key(r) -> r.getLong(1)).toMap
    assert(cnt === Map(None -> 2L, Some("g1") -> 1L))
  }

  test("decimal sum column is refused instead of silently losing exactness") {
    val dec = rows(("h1", "A", 1L, 10.0))
      .withColumn("price", col("fare").cast("decimal(18,2)"))
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.view(dec, Seq("driver_id"), Seq("price"))
    }
    assert(e.getMessage.contains("decimal") ||
      e.getMessage.contains("Decimal"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.minMaxView(dec, Seq("driver_id"), Seq("price"))
    }
    // non-numeric is refused too
    intercept[IllegalArgumentException] {
      IncrementalAgg.view(dec, Seq("driver_id"), Seq("window_start"))
    }
  }
}
