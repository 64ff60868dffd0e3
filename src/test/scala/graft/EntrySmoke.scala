package graft
class EntrySmoke extends SparkTestBase {
  test("driver contract: entry() returns rows; oracle keys ⊆ query keys") {
    assert(SparkEntry.entry(spark).count() > 0)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((ok -- qk).isEmpty, s"oracle without query: ${ok -- qk}")
    val rowsOnly = qk -- ok
    // only the two engine-specific sketches remain rows-only (their
    // error bounds are ScalaTest-checked); everything else is oracled
    assert(rowsOnly === Set("approx_distinct_users", "approx_percentiles"),
      s"unexpected rows-only: $rowsOnly")
  }
}
