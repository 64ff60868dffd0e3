package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Timing methodology:
  *  - a warm-up pass first (count each source table) so parquet
  *    footer caching isn't billed to the first query;
  *  - each query runs once untimed (pays the one-time whole-stage-
  *    codegen Janino compilation of the plan shape, ~0.5–2 s, which
  *    amortizes to zero at real scale), then the MINIMUM of three
  *    timed runs is reported: min-of-N is the standard estimator for
  *    the noise floor of a deterministic computation — GC pauses and
  *    scheduler jitter only ever ADD time (a single-shot run regressed
  *    +28% between identical-code rounds);
  *  - execution is to completion via the noop datasource (full
  *    materialization of every row, no output cost) — `count()`
  *    would let Spark skip column decoding via count pushdown and
  *    under-report.
  */
object Bench {
  /** Host-load snapshot ("1m 5m 15m running/threads" from
    * /proc/loadavg): stamped into the history line at run start and
    * end, so a degraded-window reading is diagnosable FROM THE
    * ARTIFACT (concurrent JVMs inflated rounds 14-15 readings by
    * 1.1-1.2×; before this the drift had to be re-adjudicated with
    * isolation reps).
    */
  private def loadavg: String = scala.util.Try {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.getLines().next().split("\\s+").take(4).mkString(" ")
    finally src.close()
  }.getOrElse("n/a")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val loadStart = loadavg
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reclaim scratch dirs a crashed previous JVM orphaned (see Stage)
    Stage.sweep(spark)

    // Warm-up: touch every table (parquet footers, file listing) —
    // through the schema-drift read layer, so an exotic physical
    // encoding (e.g. TIMESTAMP(NANOS) order dates) can't kill the
    // whole bench at warm-up before a single query has run.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings", "events").foreach { t =>
      graft.sources.Tables.read(spark, sfDir, t).count()
    }

    def run(name: String,
            fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        false
      }

    // Optional comma-separated query filter for focused iteration
    // (e.g. SPARK_GRAFT_BENCH_ONLY=dedup_jaccard_pairs,q1_agg).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      run(name, fn) // untimed: one-time codegen compilation of the plan
      val timings = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = run(name, fn)
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // min over SUCCESSFUL runs: a fast-failing run must not become
      // the reported time (fall back to the overall min only when
      // every run failed — the query is in `failures` either way)
      val good = timings.filter(_._2)
      val best = (if (good.nonEmpty) good else timings).map(_._1).min
      (name, best, timings.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}"""
    println(line)
    // Also persist the line: stdout tail-capture truncates past ~2k
    // chars, and the JSON outgrew that — the files are the durable
    // record. bench_last.json holds the latest run; bench_history.jsonl
    // accumulates every run (committed, so per-round numbers survive
    // the next round's overwrite) with a wall-clock stamp and the
    // machine parallelism, enough to judge cross-round comparability.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val stamped = line.dropRight(1) +
      s""","ts_ms":${System.currentTimeMillis()},"cpus":"$cpus"""" +
      s""","load_start":"$loadStart","load_end":"$loadavg"}""" + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
      stamped.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
