package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * All sketch operators (minhash, simhash, fingerprints) hash through
  * md5 rather than Spark's murmur3/xxhash64 so that an independent SQL
  * engine (the DuckDB oracle) can reproduce every bit: md5 is
  * standardized, while murmur3 seeds/variants differ across engines.
  * We take the first 15 hex digits (60 bits) so the value fits a
  * non-negative signed 64-bit integer in any engine.
  *
  * At 100 TB scale these are codegen'd built-ins (md5/conv/substring)
  * executing inside whole-stage codegen — no UDF boundary, no
  * serialization overhead; md5 costs ~1 GB/s/core which is far above
  * the per-core scan rate of a wide shuffle, so it never bottlenecks.
  */
object Hashing {

  /** 60-bit non-negative hash of a string column.
    * DuckDB equivalent: `('0x' || substring(md5(s),1,15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side FNV-1a fold over a stream of longs — the
    * engine-INTERNAL content-key mixer (artifact fingerprints, fixture
    * cache keys). Never oracle-visible: anything an engine must
    * reproduce stays md5-derived ([[hash60]]).
    */
  def fnv1a(values: IterableOnce[Long]): Long = {
    var h = -3750763034362895579L // FNV-1a offset basis
    values.iterator.foreach { v => h ^= v; h *= 1099511628211L }
    h
  }

  /** Salted variant for minhash permutation families:
    * h_i(x) = hash60(i || ':' || x).
    */
  def saltedHash60(salt: Column, c: Column): Column =
    hash60(concat(salt.cast("string"), lit(":"), c))

  /** Full md5 hex fingerprint (128-bit, as 32-char hex string). */
  def fingerprint(c: Column): Column = md5(c)

  /** Engine-portable half-up rounding of doubles:
    * `floor(x·10ⁿ + 0.5)/10ⁿ` (mirrored for negatives) — the exact
    * double-arithmetic sequence DuckDB's ROUND(DOUBLE, n) performs, so
    * both engines agree bit-for-bit even when a value lands exactly on
    * a .xx5 boundary (where Spark's BigDecimal-based `round` and
    * DuckDB's float-multiply rounding legitimately disagree: e.g.
    * avg of two 2-dp fares = 49.215 rounds to 49.21 under Spark,
    * 49.22 under DuckDB).
    */
  def portableRound(c: Column, n: Int): Column = {
    val p = lit(math.pow(10, n))
    when(c >= 0, floor(c * p + 0.5).cast("double") / p)
      .otherwise(-floor(-c * p + 0.5).cast("double") / p)
  }
}
