package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salting.
  *
  * When a handful of hot keys dominate (the classic 100 TB failure
  * mode: one key's partition runs for hours while the rest idle),
  * split each hot key into `factor` sub-keys: the large side gets a
  * deterministic salt in [0, factor), the small side is replicated
  * once per salt value. The join key becomes (key, salt), spreading
  * each hot key over `factor` tasks. Results are identical to the
  * unsalted join.
  *
  * Spark's AQE skew-join handles moderate skew automatically
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting is for
  * the pathological cases AQE can't split (e.g. a single key larger
  * than executor memory) or engines/paths where AQE is off.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`,
    * salted `factor` ways. The salt hashes the big side's FULL row
    * content — deterministic under task retries (a positional or
    * random salt would re-assign rows on stage re-execution and
    * silently drop/duplicate join output); identical duplicate rows
    * share a salt, which only costs a little residual skew.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(factor))
        .cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
