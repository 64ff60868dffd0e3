package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only job profiler: runs one named SparkEntry query (construction
  * + one noop materialization) and prints every Spark job's wall time
  * and call site, so per-turn job-count overheads (the admission
  * stores' fs-heavy paths especially) are attributable without the UI.
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <query> [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Stage.sweep(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.headOption.map { si =>
          val graftLines = si.details.split("\n")
            .filter(l => l.contains("graft.") && !l.contains("graft.tools"))
            .take(3).map(_.trim.replaceAll("^at ", ""))
          si.name.take(60) + "  <- " + graftLines.mkString(" <- ")
        }.getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (collecting && s != null) {
          val ms = (System.nanoTime() - s._1) / 1e6
          println(f"[job] ${je.jobId}%4d ${ms}%9.1f ms  ${s._2}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(name)
    // warm-up (codegen, footers)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { i =>
      println(s"===== rep $i =====")
      collecting = true
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tc = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let listener events drain
      collecting = false
      println(f"[total] construct ${(tc - t0) / 1e6}%9.1f ms  noop ${(t1 - tc) / 1e6}%9.1f ms")
    }
    spark.stop()
  }
}
