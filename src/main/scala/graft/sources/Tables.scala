package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift armor for the external parquet tables.
  *
  * External tables are written by producers the engine does not
  * control, and their PHYSICAL encodings drift across regenerations:
  * the events table has shipped `ts` as TIMESTAMP(NANOS), as
  * timestamp[us] with isAdjustedToUTC=false (→ TIMESTAMP_NTZ), and as
  * plain UTC micros; ids can arrive int32 or int64, money columns
  * float32/float64/decimal. One such flip once took out every
  * consumer of one table at once, so no read may assume the encoding
  * it happened to see last.
  *
  * Policy, per logical column class:
  *
  *  - **Event-time columns** are NORMALIZED: every supported parquet
  *    timestamp spelling converges to microsecond [[TimestampType]]
  *    (under the engine's pinned UTC session the NTZ→TZ cast is
  *    instant-preserving). A DATE-encoded column stays [[DateType]] —
  *    widening it to midnight timestamps would diverge from what any
  *    other reader of the same file sees.
  *  - **Integral / fractional / text / vector columns** are VALIDATED
  *    against their accepted type family and passed through
  *    unchanged. No cast: the DuckDB oracle (and any other consumer)
  *    reads the same physical files, so an engine-side widening would
  *    diverge from, not converge to, what the rest of the world
  *    computes. Every downstream operator handles the full family
  *    (e.g. the native cosine/SRP expressions accept float32 and
  *    float64 arrays). Decimals are the exception — Spark decimal
  *    arithmetic diverges from the double arithmetic every query is
  *    written in, so scale-0 decimals cast to long and money decimals
  *    to double.
  *  - Anything else **fails loudly** naming `table.column` and the
  *    offending physical type, never by letting 30 queries die one by
  *    one on analysis errors.
  *
  * TIMESTAMP(NANOS) has no Spark type at all: reading it requires
  * `spark.sql.legacy.parquet.nanosAsLong=true`, under which it
  * surfaces as [[LongType]]. The conf is probed, not assumed: a first
  * read attempt without it stays side-effect-free for every session
  * whose data doesn't need it; only when the read fails with the
  * nanos analysis error is the conf set — once, session-wide, and it
  * must STAY set because file scans consult it again at execution
  * time. That session-wide flip is the engine's one documented
  * precondition on nanos-encoded data (the alternative Spark offers
  * is no read at all).
  *
  * Whether a LongType event-time column actually IS nanos is decided
  * PER FILE, never from the session conf: the conf is sticky, so in a
  * session that has read one genuinely-nanos table, a plain-int64
  * column in a *different* table would also surface as LongType — and
  * trusting the conf would silently divide its values by 1000. The
  * reader instead inspects the parquet footer's logical type
  * annotation (one footer read, only on the LongType-event-time
  * path): TIMESTAMP(NANOS) normalizes, anything else is a plain int64
  * with no declared epoch unit (nanos? micros? millis?) and fails
  * loudly rather than guessing — the same refusal a fresh session
  * gives, now order-independent of which tables were read first.
  */
object Tables {

  val nanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Logical column classes — what a column MEANS, decoupled from how
    * a producer happened to encode it.
    */
  sealed trait Kind
  case object EventTime extends Kind
  case object Integral extends Kind
  case object Fractional extends Kind
  case object Text extends Kind
  case object FloatVector extends Kind

  /** The logical schema of every external table the engine reads.
    * Columns present in a file but absent here pass through untouched
    * (producers may append columns); columns declared here but absent
    * from the file fail loudly.
    */
  val canonical: Map[String, Map[String, Kind]] = Map(
    "region" -> Map("r_regionkey" -> Integral, "r_name" -> Text),
    "nation" -> Map(
      "n_nationkey" -> Integral, "n_name" -> Text, "n_regionkey" -> Integral),
    "customer" -> Map(
      "c_custkey" -> Integral, "c_name" -> Text, "c_nationkey" -> Integral,
      "c_acctbal" -> Fractional, "c_mktsegment" -> Text),
    "supplier" -> Map(
      "s_suppkey" -> Integral, "s_name" -> Text, "s_nationkey" -> Integral,
      "s_acctbal" -> Fractional),
    "part" -> Map(
      "p_partkey" -> Integral, "p_name" -> Text, "p_brand" -> Text,
      "p_type" -> Text, "p_size" -> Integral, "p_retailprice" -> Fractional),
    "orders" -> Map(
      "o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Text, "o_totalprice" -> Fractional,
      "o_orderdate" -> EventTime, "o_orderpriority" -> Text),
    "lineitem" -> Map(
      "l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Text, "l_linestatus" -> Text,
      "l_shipdate" -> EventTime),
    "events" -> Map(
      "event_id" -> Integral, "ts" -> EventTime, "user_id" -> Integral,
      "event_type" -> Text, "value" -> Fractional, "props" -> Text),
    "documents" -> Map(
      "doc_id" -> Integral, "text" -> Text, "lang" -> Text,
      "source" -> Text, "n_chars" -> Integral),
    "embeddings" -> Map(
      "vec_id" -> Integral, "embedding" -> FloatVector, "label" -> Integral))

  /** Read `dir/name.parquet`, adapted/validated against the table's
    * logical schema. Unknown table names read plain (no contract to
    * enforce).
    */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val (raw, nanosMode) = readRaw(spark, path)
    canonical.get(name) match {
      case None => raw
      case Some(spec) =>
        // per-FILE nanos ground truth (footer logical type), probed
        // lazily — only the LongType-event-time path consults it
        lazy val nanosCols = nanosColumns(spark, path)
        spec.foldLeft(raw) { case (df, (colName, kind)) =>
          normalize(df, name, colName, kind,
            nanosMode && nanosCols.contains(colName))
        }
    }
  }

  /** Column names in the first data file of `path` whose parquet
    * logical type annotation is TIMESTAMP with NANOS unit — the
    * per-file ground truth the session-sticky `nanosAsLong` conf
    * cannot provide (see class doc). One footer read, proportional to
    * file-metadata size, not data. Multi-file tables are assumed
    * encoding-uniform (one producer per table — the same assumption
    * Spark's own schema inference samples under).
    */
  private def nanosColumns(spark: SparkSession, path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val first = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName).headOption
    first match {
      case None => Set.empty
      case Some(st) =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, conf))
        try {
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala
            .iterator
            .filter(_.isPrimitive)
            .filter(_.asPrimitiveType().getLogicalTypeAnnotation match {
              case ts: org.apache.parquet.schema.LogicalTypeAnnotation
                         .TimestampLogicalTypeAnnotation =>
                ts.getUnit ==
                  org.apache.parquet.schema.LogicalTypeAnnotation
                    .TimeUnit.NANOS
              case _ => false
            })
            .map(_.getName).toSet
        } finally reader.close()
    }
  }

  /** Inferred-schema memo — the catalog's job, done locally: every
    * `spark.read.parquet(path)` re-infers the table schema, which on
    * multi-file tables runs a footer-merge JOB (~50 ms) per read —
    * paid by every query invocation for immutable input files
    * (production avoids exactly this with a metastore/table format;
    * guide §6). Keyed by the files' (name, length, mtime) fingerprint
    * — any rewrite re-infers — AND the nanosAsLong conf state, since
    * inference under the flipped conf yields a different schema
    * (LongType vs analysis error) for TIMESTAMP(NANOS) columns. Only
    * METADATA is cached; every read still scans the parquet data.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  private val schemaCacheMax = 256

  private def schemaKey(spark: SparkSession, path: String,
                        nanosOn: Boolean): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = scala.util.Try(fs.listStatus(p)).getOrElse(Array.empty)
      .sortBy(_.getPath.getName)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
    s"$path|nanos=$nanosOn|${parts.mkString(",")}"
  }

  /** Plain parquet read, retried once under `nanosAsLong` iff the
    * first attempt failed on a TIMESTAMP(NANOS) column. Returns
    * whether nanos-as-long semantics are in effect for this read.
    */
  private def readRaw(spark: SparkSession, path: String): (DataFrame, Boolean) = {
    val alreadyOn = spark.conf.getOption(nanosAsLongKey).contains("true")
    // the fingerprint is computed ONCE, before the read, and reused by
    // remember(): the former post-read recompute both paid a second
    // listStatus and could pin a schema under a fingerprint taken
    // AFTER a racing rewrite — i.e. remember a stale schema for the
    // rewritten file set. Keying on the pre-read listing means a race
    // at worst caches the schema the read itself saw, under the
    // fingerprint of the files it read. (The layout assumption stands:
    // source tables are flat parquet dirs — the fingerprint covers the
    // direct children, which for these tables IS the file set.)
    val key = schemaKey(spark, path, alreadyOn)
    val cached = schemaCache.get(key)
    if (cached != null)
      return (spark.read.schema(cached).parquet(path), alreadyOn)
    def remember(df: DataFrame, nanosOn: Boolean): DataFrame = {
      if (schemaCache.size >= schemaCacheMax) schemaCache.clear()
      // same listing as the pre-read key; only the conf flag can
      // differ (the nanos retry flips it)
      val k = if (nanosOn == alreadyOn) key
        else schemaKey(spark, path, nanosOn)
      schemaCache.put(k, df.schema)
      df
    }
    try {
      (remember(spark.read.parquet(path), alreadyOn), alreadyOn)
    } catch {
      // Matched on the NANOS analysis message across the cause chain,
      // not on exception class: Spark surfaces the illegal-parquet-type
      // failure as AnalysisException from driver-side inference but may
      // wrap it (SparkException) when footers are read distributed.
      case e: Exception if !alreadyOn && mentionsNanos(e) =>
        // Documented session precondition on nanos data (see scaladoc):
        // the conf must remain set — execution-time scans re-read it.
        spark.conf.set(nanosAsLongKey, "true")
        (remember(spark.read.parquet(path), true), true)
    }
  }

  private def mentionsNanos(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("NANOS")))

  /** `fileNanos`: this COLUMN is TIMESTAMP(NANOS) in the file footer
    * AND the session conf that lets Spark surface it (as LongType) is
    * on — the only combination under which a long event-time column
    * is interpretable.
    */
  private def normalize(df: DataFrame, table: String, colName: String,
                        kind: Kind, fileNanos: Boolean): DataFrame = {
    val field = df.schema.find(_.name == colName).getOrElse(
      throw new IllegalStateException(
        s"$table.$colName: column missing from ${df.schema.fieldNames.mkString("[", ",", "]")}"))
    def unsupported(expected: String): Nothing =
      throw new IllegalStateException(
        s"$table.$colName: unsupported physical type ${field.dataType} " +
          s"(expected $expected)")
    kind match {
      case EventTime => field.dataType match {
        case TimestampType => df
        case TimestampNTZType =>
          // instant-preserving under the engine's pinned UTC session
          df.withColumn(colName, col(colName).cast(TimestampType))
        case DateType => df // date stays date: every reader sees dates
        case LongType if fileNanos =>
          // TIMESTAMP(NANOS) surfaced as nano longs: floor to µs,
          // matching how nanos-aware readers (DuckDB) truncate
          df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
        case LongType =>
          // refused even in a session whose conf is on for OTHER
          // tables' nanos data — the footer says this column carries
          // no timestamp annotation, so its epoch unit is a guess
          unsupported("a timestamp spelling; a plain int64 event-time " +
            "column has no declared epoch unit — re-encode it as " +
            "parquet TIMESTAMP(NANOS/MICROS/MILLIS)")
        case _ => unsupported("TIMESTAMP, TIMESTAMP_NTZ, DATE, or " +
          "TIMESTAMP(NANOS) under nanosAsLong")
      }
      case Integral => field.dataType match {
        case ByteType | ShortType | IntegerType | LongType => df
        case d: DecimalType if d.scale == 0 && d.precision <= 18 =>
          // scale-0 decimal is an integer in a costume — but decimal
          // ARITHMETIC diverges from the long arithmetic queries use
          df.withColumn(colName, col(colName).cast(LongType))
        case _ => unsupported("an integral type")
      }
      case Fractional => field.dataType match {
        case FloatType | DoubleType => df
        case _: DecimalType => df.withColumn(colName, col(colName).cast(DoubleType))
        case _ => unsupported("float, double, or decimal")
      }
      case Text => field.dataType match {
        case StringType => df
        case _ => unsupported("string")
      }
      case FloatVector => field.dataType match {
        case ArrayType(FloatType | DoubleType, _) => df
        case ArrayType(_: DecimalType, _) =>
          df.withColumn(colName, col(colName).cast(ArrayType(DoubleType)))
        case _ => unsupported("array<float> or array<double>")
      }
    }
  }
}
