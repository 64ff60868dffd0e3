package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, sum}

/** Size-gated model-table join — the scale guard for every
  * "score the corpus against a corpus-derived model" operator
  * (unigram/bigram LM proxies, the curation LM leg).
  *
  * Model tables (word frequencies, bigram counts) are comfortably
  * broadcastable at test scale, but their row counts GROW with the
  * corpus — vocabulary sublinearly (Heaps' law), bigram types
  * near-linearly — so an unconditional `broadcast(model)` is a
  * driver/executor OOM waiting at 100 TB. The gate measures the model
  * (one cheap count over an already-materialized table) and picks:
  *
  *   - rows ≤ threshold → `broadcast(model)`: zero stream shuffle,
  *     the test/steady-state fast path;
  *   - rows > threshold → `model.hint("shuffle_hash")`: both sides
  *     hash-exchange on the join key. The scoring stream is already
  *     exploded on exactly that key (word / bg / ctx), so the
  *     exchange is the payload-free kind [[Dedup.jaccardPairs]]
  *     already prefers, and shuffle_hash avoids sort-merge's
  *     per-partition sort of a massively-duplicated key.
  *
  * Results are identical either way (LangModelSpec pins it); only the
  * physical join strategy moves. Callers MUST pass a materialized
  * model (parquet read or localCheckpoint) — the count would
  * otherwise recompute the model aggregation a second time when the
  * join executes.
  *
  * Threshold conf: `graft.model.broadcastMaxRows` (default 2M rows —
  * ~10s of MB for short-string key tables, inside executor broadcast
  * comfort; set 0 to force the shuffle path, as the plan-audit and
  * scale-proof runs do).
  */
object ModelJoin {

  val broadcastMaxRowsKey = "graft.model.broadcastMaxRows"
  val defaultBroadcastMaxRows = 2000000L

  def broadcastMaxRows(df: DataFrame): Long =
    df.sparkSession.conf.getOption(broadcastMaxRowsKey)
      .map(_.toLong).getOrElse(defaultBroadcastMaxRows)

  /** Session-scoped memo of model row counts, so N joins against the
    * same materialized model pay ONE count job, not N (the durable
    * LangModel store re-reads its parquet tables per scoring call —
    * each used to re-count). Models are write-once by the callers'
    * contract (modelPath / localCheckpoint), so a memoized count
    * cannot go stale within a session.
    *
    * Sessions are weak keys and — critically — the VALUES are plain
    * strings: an earlier version cached the analyzed `LogicalPlan`s
    * themselves, whose file-source relations strongly reference the
    * session, so the weak key could never clear and each dead session
    * leaked itself plus its plans. The memo key is the canonicalized
    * plan tree rendered to text PLUS the file-source root paths (the
    * canonicalized tree alone elides locations, which would conflate
    * two same-schema models at different paths). Plans with no file
    * relation (e.g. checkpoint-backed RDD scans) have no stable
    * session-free identity, so they are counted, not memoized.
    */
  private val maxCountCacheEntries = 64
  private val countCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.mutable.ArrayDeque[(String, Long)]]())

  /** Session-free identity of a model plan, or None if the plan holds
    * no file-backed relation to anchor it.
    */
  private[graft] def memoKey(model: DataFrame): Option[String] = {
    val plan = model.queryExecution.analyzed
    val paths = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString).sorted.mkString(",")
          case other => other.toString
        }
    }
    if (paths.isEmpty) None
    // treeString with an EXPLICIT unlimited field count: the default
    // rendering truncates per-node field lists at
    // spark.sql.debug.maxToStringFields (25), so two plans over the
    // same root paths differing only past the cutoff (e.g. wide
    // aggregate lists) would render the same key and silently serve
    // each other's cached count
    else Some(plan.canonicalized.treeString(
      verbose = false, addSuffix = false, maxFields = Int.MaxValue,
      printOperatorId = false) + "\n@" + paths.mkString(";"))
  }

  private def cachedCount(model: DataFrame): Long = memoKey(model) match {
    case None => model.count()
    case Some(key) =>
      val entries = countCache.synchronized {
        var e = countCache.get(model.sparkSession)
        if (e == null) {
          e = scala.collection.mutable.ArrayDeque.empty[(String, Long)]
          countCache.put(model.sparkSession, e)
        }
        e
      }
      entries.synchronized {
        entries.find(_._1 == key).map(_._2)
      }.getOrElse {
        val n = model.count() // outside the lock: counts may run long
        entries.synchronized {
          if (entries.size >= maxCountCacheEntries) entries.removeHead()
          entries.append((key, n))
        }
        n
      }
  }

  /** `stream ⋈ model` on `keys`, broadcast below the row threshold,
    * shuffled-hash above it. `model` must be materialized (see class
    * doc); `joinType` as in `Dataset.join`.
    */
  def sizeGated(stream: DataFrame, model: DataFrame, keys: Seq[String],
                joinType: String = "inner"): DataFrame =
    if (cachedCount(model) <= broadcastMaxRows(model)) {
      stream.join(broadcast(model), keys, joinType)
    } else {
      stream.join(model.hint("shuffle_hash"), keys, joinType)
    }

  /** Materialize a model table and read `SUM(sumCol)` off the SAME job
    * via an Observation — the freq-checkpoint + total-`first()` shape
    * every corpus-LM consumer repeats, at one job instead of two
    * (the second was a full plan + scheduler round-trip to re-read a
    * scalar the materializing pass had already seen). Returns None for
    * an empty (or all-NULL) model, like `SUM` itself.
    */
  def checkpointWithSum(model: DataFrame, sumCol: String)
      : (DataFrame, Option[Long]) = {
    val obs = org.apache.spark.sql.Observation()
    val out = model.observe(obs, sum(col(sumCol)).as("_mj_total"))
      .localCheckpoint(true)
    val total = obs.get("_mj_total") match {
      case null => None
      case l: java.lang.Long => Some(l.longValue())
      case other => throw new IllegalStateException(
        s"unexpected observation payload: $other")
    }
    (out, total)
  }
}
