package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shuffle-free co-located joins via bucketed tables.
  *
  * A `groupBy`/`join` on an unbucketed table shuffles the FULL fact
  * table on every query — at 100 TB that exchange, not the join
  * itself, is the bill. Writing the table bucketed (hash-partitioned
  * into a fixed bucket count on the join key, persisted in the
  * catalog) pays the shuffle ONCE at write time; every later
  * equi-join or aggregation on that key reads the co-located buckets
  * directly and plans with **zero Exchange**. `sortBy` additionally
  * persists within-bucket order so single-file buckets skip the
  * sort-merge join's Sort.
  *
  * This is the standing-table complement to [[Skew.saltedJoin]]
  * (one-shot skew relief) and `repartition` (per-query co-location):
  * use it for the fact tables a pipeline joins repeatedly on the same
  * key — e.g. the rides/events stores every gold query keys by
  * entity id.
  *
  * Both sides of a join must agree on bucket COUNT (or be integer
  * multiples, with `spark.sql.bucketing.coalesceBucketsInJoin
  * .enabled`) and key for the exchange to be elided; a mismatch
  * silently falls back to a plain shuffle, so [[assertCoLocated]]
  * exists to make the plan property testable instead of assumed
  * (PlanAuditSpec-style).
  */
object Bucketed {

  /** Persist `df` as a parquet-backed managed table bucketed (and
    * within-bucket sorted) on `key`. Overwrites any previous table of
    * the same name. Bucket count is a LAYOUT contract, not a tuning
    * knob per query — pick it once per table so all co-bucketed
    * joins agree (at 100 TB: total size / ~128 MB target files).
    */
  /** The layout contract a table name stands for: join key, bucket
    * count, and a hash of the column schema. Persisted as table
    * properties at write time and verified by [[ensureBucketed]] —
    * a name is a claim about layout, and claims get checked.
    */
  private def schemaText(schema: org.apache.spark.sql.types.StructType): String =
    schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")

  private def fingerprint(key: String, buckets: Int,
                          schema: org.apache.spark.sql.types.StructType): String =
    // sha-256, not String.hashCode: a 32-bit hash over the full space
    // of column schemas WILL collide eventually, and a collision here
    // silently passes the layout check for the wrong relation
    s"key=$key;buckets=$buckets;schemaSha256=" +
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(schemaText(schema).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    // A crashed (or simply previous) JVM can leave the managed-table
    // DIRECTORY on disk with no entry in this session's catalog;
    // saveAsTable refuses to adopt such an orphan location
    // (LOCATION_ALREADY_EXISTS) rather than overwrite data it has no
    // metadata for. The catalog is authoritative here: no entry means
    // the directory is dead layout, so reclaim it before writing.
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // pre-partition on the bucketing hash so each write task holds
    // exactly one bucket's rows — `buckets` files instead of
    // tasks×buckets splinters (the small-files tax matters at 100 TB:
    // bucketed scans open every file of every touched bucket)
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    // record the layout contract on the table itself so a later
    // ensureBucketed can VERIFY the name instead of trusting it
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      s"'graft.bucketed.fingerprint' = " +
      s"'${fingerprint(key, buckets, df.schema)}')")
  }

  /** [[writeBucketed]] only if `table` isn't already in the session
    * catalog — the write-once half of bucketing's contract (pay the
    * layout shuffle once, run every later join/agg shuffle-free).
    * Callers that re-derive the same table each run (benchmarks, the
    * Verify harness) go through this so repetition measures the
    * CO-LOCATED QUERY, not a redundant rewrite.
    *
    * An EXISTING table is verified, not trusted: its recorded
    * layout fingerprint (key, bucket count, schema hash — written by
    * [[writeBucketed]] as a table property) must match the requested
    * one. A mismatch means the name collides with a different layout —
    * reusing it would silently re-introduce the shuffle this machinery
    * exists to elide (wrong key / count) or read the wrong relation
    * (schema drift), so it throws instead of either clobbering the
    * existing table or limping along.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      writeBucketed(df, table, key, buckets)
    } else {
      val meta = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      // The catalog's own bucket spec is authoritative for key/count —
      // it's what the planner reads when deciding to elide the
      // Exchange, so verify layout against it, not only our stamp.
      require(meta.bucketSpec.exists(s =>
        s.numBuckets == buckets && s.bucketColumnNames == Seq(key)),
        s"table $table exists bucketed as " +
          s"${meta.bucketSpec.map(s => s"key=${s.bucketColumnNames.mkString(",")};buckets=${s.numBuckets}").getOrElse("<unbucketed>")} " +
          s"but key=$key;buckets=$buckets was requested — drop the table " +
          "or pick a name that pins this layout")
      val want = fingerprint(key, buckets, df.schema)
      meta.properties.get("graft.bucketed.fingerprint") match {
        case Some(got) if got.contains("schemaSha256=") =>
          require(got == want,
            s"table $table exists with layout $got but $want was " +
              "requested — drop the table or pick a name that pins this layout")
        case _ =>
          // Legacy table: written before fingerprints existed (or under
          // the old 32-bit stamp format). Rejecting it would break
          // previously valid persisted warehouses, so verify the schema
          // against the CATALOG's recorded schema and stamp the modern
          // fingerprint for cheap later checks.
          require(schemaText(meta.schema) == schemaText(df.schema),
            s"table $table exists with schema [${schemaText(meta.schema)}] " +
              s"but [${schemaText(df.schema)}] was requested — drop the " +
              "table or pick a name that pins this layout")
          spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
            s"'graft.bucketed.fingerprint' = '$want')")
      }
    }
  }

  /** Inner equi-join of two co-bucketed tables on `key`. The result
    * is a plain join — the value is the PLAN: with both sides
    * bucketed on `key` at the same count, the planner reads buckets
    * as pre-partitioned splits and emits no Exchange on either side.
    */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
           key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Throws if `df`'s physical plan contains a SHUFFLE exchange — the
    * guard against the silent fallback modes (bucket-count mismatch,
    * bucketing disabled, a non-equi condition) that turn a
    * "co-located" join back into a full exchange without any error.
    *
    * Detection walks the plan TREE for `ShuffleExchangeLike` nodes
    * (descending through AQE wrappers, whose children are hidden from
    * a plain collect) rather than string-matching "Exchange": the
    * string test also trips on BroadcastExchange — which moves a
    * small table, not the data being co-located, and is a legitimate
    * plan for a bucketed table joined to a tiny one — and on any
    * operator or expression that merely mentions the word.
    */
  def assertCoLocated(df: DataFrame): DataFrame = {
    val shuffles = collectShuffles(df.queryExecution.executedPlan)
    require(shuffles.isEmpty,
      s"join expected to be co-located but the plan holds " +
        s"${shuffles.size} shuffle exchange(s) " +
        s"[${shuffles.map(_.nodeName).mkString(", ")}]:\n" +
        df.queryExecution.executedPlan)
    df
  }

  private def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect {
      // AQE roots are leaf nodes to TreeNode.collect — recurse into
      // the CURRENT wrapped plan (post-EnsureRequirements, so the
      // inserted exchanges are visible; inputPlan would be the
      // pre-preparation tree, which never holds them)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectShuffles(a.executedPlan)
      // once AQE has started executing, exchanges are wrapped in
      // (leaf) query stages — unwrap to keep the guard usable on a
      // plan that already ran
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
        Seq(s.shuffle)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        Seq(e)
    }.flatten
}
