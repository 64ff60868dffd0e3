package graft

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

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
  * applied to scratch space): delete root entries whose NEWEST
  * activity is older than `graft.stage.ttlMs` (default 24 h).
  *
  * Liveness is explicit, not assumed: a run that outlives the TTL
  * (a big-SF bench, a many-thousand-round BPE train) keeps its dirs
  * alive because every durable-window write refreshes mtimes inside
  * them, and long READ-mostly phases call [[heartbeat]] to touch a
  * marker file. The sweep keys on the newest mtime found UNDER an
  * entry (entry itself, children, grandchildren — the depths scratch
  * layouts actually use), so activity anywhere in the dir counts.
  * Only entries matching the scratch NAMING pattern
  * (`<tag>-<8 hex chars>`, [[scratchDir]]'s spelling) are candidates:
  * a misconfigured `graft.stage.dir` pointing at a shared directory
  * can never delete unrelated files. Verify and Bench call [[sweep]]
  * on startup.
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

  /** The scratch naming pattern [[scratchDir]] (and every content-keyed
    * fixture that opts into the swept lifecycle) uses: anything else
    * under the root is foreign and never touched by [[sweep]].
    */
  private val scratchName = ".+-[0-9a-f]{8}".r

  /** Refresh a scratch dir's liveness: touch (create or overwrite) a
    * `_heartbeat` marker inside it, so [[sweep]]'s newest-mtime probe
    * sees recent activity. Call at durable-window boundaries of
    * long-running writers and on cross-process REUSE of a persisted
    * fixture — a reused artifact is live again even though its data
    * files are old.
    */
  def heartbeat(s: SparkSession, dir: String): Unit = {
    val p = new Path(dir, "_heartbeat")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    scala.util.Try(fs.create(p, true).close())
  }

  /** Newest modification time at or under `st`, probing to
    * `depth` levels (0 = the entry itself). Short-circuits as soon as
    * something younger than `horizon` is found — the deep listing only
    * happens for entries that already look stale at the shallower
    * level.
    */
  private def newestMtime(fs: FileSystem,
                          st: org.apache.hadoop.fs.FileStatus,
                          depth: Int, horizon: Long): Long = {
    var newest = st.getModificationTime
    if (newest > horizon || depth == 0 || !st.isDirectory) return newest
    val children = scala.util.Try(fs.listStatus(st.getPath))
      .getOrElse(Array.empty)
    var i = 0
    while (i < children.length && newest <= horizon) {
      newest = math.max(newest,
        newestMtime(fs, children(i), depth - 1, horizon))
      i += 1
    }
    newest
  }

  /** Reclaim crash-orphaned scratch dirs whose newest activity —
    * anywhere under the entry, down to grandchild depth — is older
    * than the TTL horizon (`graft.stage.ttlMs`, default 24 h); returns
    * how many were deleted. Entries with ANY recent mtime (a live
    * concurrent process writing, or a [[heartbeat]] touch) always
    * survive, as does anything not matching the scratch naming
    * pattern.
    */
  def sweep(s: SparkSession, ttlMs: Option[Long] = None): Int = {
    val ttl = ttlMs
      .orElse(s.conf.getOption("graft.stage.ttlMs").map(_.toLong))
      .getOrElse(24L * 3600 * 1000)
    val rootP = new Path(root(s))
    val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return 0
    val horizon = System.currentTimeMillis() - ttl
    val stale = fs.listStatus(rootP)
      .filter(st => scratchName.pattern.matcher(st.getPath.getName).matches)
      .filter(st => newestMtime(fs, st, depth = 2, horizon) <= horizon)
    // TOCTOU guard: a heartbeat (or fixture access) can land between
    // the scan above and the delete below — re-probe each candidate's
    // newest mtime from a FRESH status immediately before deleting, so
    // liveness that arrived mid-sweep wins. (The scan is the expensive
    // pass; the re-probe only runs on already-stale entries.)
    stale.count { st =>
      val fresh = scala.util.Try(fs.getFileStatus(st.getPath)).toOption
      val stillStale = fresh.exists(f =>
        newestMtime(fs, f, depth = 2, horizon) <= horizon)
      if (stillStale) fs.delete(st.getPath, true)
      stillStale
    }
  }
}
