package graft

import org.apache.hadoop.fs.Path

/** Scratch-space lifecycle: crash-orphan sweep reclaims stale dirs
  * while in-flight (young) dirs survive.
  */
class StageSpec extends SparkTestBase {

  test("sweep reclaims a stale orphan, spares an in-flight dir") {
    val root = tmpDir("stage-root")
    spark.conf.set("graft.stage.dir", root)
    try {
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // a crashed JVM's leftover: old mtime, deleteOnExit never ran
      val stale = new Path(root, "staged-deadbeef")
      fs.mkdirs(stale)
      fs.setTimes(stale, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
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
