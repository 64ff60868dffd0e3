package graft

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** The ONE spelling of the durable scratch-space lifecycle shared by
  * every write-once artifact and staging projection ([[SparkEntry]]'s
  * `staged()` durable branch, the BPE tokenizer fixture, the trainer's
  * periodic durable checkpoints): per-invocation UUID-suffixed dirs
  * under `graft.stage.dir` (a SHARED store path on a real cluster;
  * java.io.tmpdir locally), registered for JVM-exit deletion.
  *
  * `FileSystem.deleteOnExit` only runs on clean shutdown — a crashed
  * JVM leaves its scratch dirs behind forever. [[sweep]] is the
  * age-horizoned reclaim for those orphans (the `vacuum()` idea
  * applied to scratch space): delete root entries whose modification
  * time is older than `graft.stage.ttlMs` (default 24 h). The horizon
  * is the safety argument — every LIVE scratch dir belongs to an
  * in-flight invocation younger than the TTL (scratch is
  * per-invocation by construction, never a long-lived store), so a
  * startup-time sweep can only reclaim dirs whose owning process is
  * long gone. Verify and Bench call it on startup.
  */
object Stage {

  /** Scratch root: `graft.stage.dir`, or `<tmpdir>/graft-stage`. */
  def root(s: SparkSession): String =
    s.conf.getOption("graft.stage.dir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-stage")

  /** Fresh per-invocation scratch dir (UUID-suffixed, JVM-exit
    * deletion registered). The caller owns the contents' lifetime up
    * to process exit; see [[sweep]] for crash orphans.
    */
  def scratchDir(s: SparkSession, tag: String): String = {
    val dir = s"${root(s)}/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
    val p = new Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(p)
    dir
  }

  /** Reclaim crash-orphaned scratch dirs older than the TTL horizon
    * (`graft.stage.ttlMs`, default 24 h); returns how many were
    * deleted. Entries younger than the horizon — possibly owned by a
    * live concurrent process sharing the root — always survive.
    */
  def sweep(s: SparkSession, ttlMs: Option[Long] = None): Int = {
    val ttl = ttlMs
      .orElse(s.conf.getOption("graft.stage.ttlMs").map(_.toLong))
      .getOrElse(24L * 3600 * 1000)
    val rootP = new Path(root(s))
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return 0
    val now = System.currentTimeMillis()
    val stale = fs.listStatus(rootP)
      .filter(st => now - st.getModificationTime > ttl)
    stale.foreach(st => fs.delete(st.getPath, true))
    stale.length
  }
}
