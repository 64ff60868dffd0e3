package graft
class EntrySmoke extends SparkTestBase {
  test("driver contract: entry() returns rows; oracle keys ⊆ query keys") {
    assert(SparkEntry.entry(spark).count() > 0)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((ok -- qk).isEmpty, s"oracle without query: ${ok -- qk}")
    val rowsOnly = qk -- ok
    // only the two engine-specific sketch TWINS remain rows-only
    // (their error bounds are ScalaTest-checked); the deterministic
    // hash-sample estimators under the original names are oracled,
    // like everything else
    assert(rowsOnly === Set("approx_distinct_users_sketch",
        "approx_percentiles_sketch"),
      s"unexpected rows-only: $rowsOnly")
  }
}
