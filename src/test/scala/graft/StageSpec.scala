package graft

import org.apache.hadoop.fs.Path

/** Scratch-space lifecycle: crash-orphan sweep reclaims stale dirs
  * while in-flight (young) dirs survive; liveness is the newest mtime
  * under the entry (heartbeats, nested durable-window writes), and
  * only scratch-patterned names are ever candidates.
  */
class StageSpec extends SparkTestBase {

  private def setOld(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                     hoursAgo: Long = 48): Unit =
    fs.setTimes(p, System.currentTimeMillis() - hoursAgo * 3600 * 1000, -1)

  test("sweep reclaims a stale orphan, spares an in-flight dir") {
    val root = tmpDir("stage-root")
    spark.conf.set("graft.stage.dir", root)
    try {
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // a crashed JVM's leftover: old mtime, deleteOnExit never ran
      val stale = new Path(root, "staged-deadbeef")
      fs.mkdirs(stale)
      setOld(fs, stale)
      // an in-flight invocation's dir: just created
      val live = Stage.scratchDir(spark, "staged")
      fs.mkdirs(new Path(live))
      val swept = Stage.sweep(spark) // default 24 h horizon
      assert(swept === 1, "expected exactly the stale orphan reclaimed")
      assert(!fs.exists(stale), "stale orphan survived the sweep")
      assert(fs.exists(new Path(live)), "in-flight dir was reclaimed")
      // a second sweep is a no-op
      assert(Stage.sweep(spark) === 0)
      // explicit horizon override: 0 ms reclaims everything
      assert(Stage.sweep(spark, Some(0L)) === 1)
      assert(!fs.exists(new Path(live)))
      // missing root: no-op, no error
      spark.conf.set("graft.stage.dir", root + "/nowhere")
      assert(Stage.sweep(spark) === 0)
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("sweep never touches foreign names, even past the horizon") {
    val root = tmpDir("stage-root3")
    spark.conf.set("graft.stage.dir", root)
    try {
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // a misconfigured stage dir could point at a shared directory:
      // names outside the <tag>-<8hex> scratch pattern must survive
      // any horizon, including an explicit 0
      val foreignDir = new Path(root, "user-data")
      val foreignFile = new Path(root, "notes.txt")
      fs.mkdirs(foreignDir)
      fs.create(foreignFile, true).close()
      setOld(fs, foreignDir); setOld(fs, foreignFile)
      assert(Stage.sweep(spark) === 0)
      assert(Stage.sweep(spark, Some(0L)) === 0)
      assert(fs.exists(foreignDir) && fs.exists(foreignFile),
        "foreign entries must never be swept")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("liveness = newest mtime under the entry: heartbeat and nested " +
    "writes keep an old dir alive") {
    val root = tmpDir("stage-root4")
    spark.conf.set("graft.stage.dir", root)
    try {
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // a long-running train's dir: CREATED before the horizon, but a
      // recent heartbeat marks it live
      val beating = new Path(root, "bpe-train-aaaa1111")
      fs.mkdirs(beating)
      Stage.heartbeat(spark, beating.toString)
      setOld(fs, beating) // root entry looks stale; heartbeat is young
      // activity two levels down (a durable window's data files) also
      // counts — every visible mtime aged EXCEPT the grandchild
      val nested = new Path(root, "ckpt-bbbb2222")
      val sub = new Path(nested, "state-64")
      fs.mkdirs(sub)
      fs.create(new Path(sub, "part-0.parquet"), true).close()
      setOld(fs, nested); setOld(fs, sub)
      // a genuinely dead dir: everything old, heartbeat included
      val dead = new Path(root, "gone-cccc3333")
      fs.mkdirs(dead)
      Stage.heartbeat(spark, dead.toString)
      setOld(fs, dead); setOld(fs, new Path(dead, "_heartbeat"))
      assert(Stage.sweep(spark) === 1, "only the dead dir is reclaimable")
      assert(fs.exists(beating), "heartbeat dir was swept")
      assert(fs.exists(nested), "dir with young grandchild was swept")
      assert(!fs.exists(dead), "dead dir survived")
    } finally spark.conf.unset("graft.stage.dir")
  }

  test("scratchDir lands under the configured root, unique per call") {
    val root = tmpDir("stage-root2")
    spark.conf.set("graft.stage.dir", root)
    try {
      val a = Stage.scratchDir(spark, "t")
      val b = Stage.scratchDir(spark, "t")
      assert(a.startsWith(root) && b.startsWith(root))
      assert(a !== b, "scratch dirs must be per-invocation unique")
    } finally spark.conf.unset("graft.stage.dir")
  }
}
