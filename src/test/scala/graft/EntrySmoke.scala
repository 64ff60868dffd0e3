package graft
class EntrySmoke extends SparkTestBase {
  test("driver contract: entry() returns rows; oracle keys ⊆ query keys") {
    assert(SparkEntry.entry(spark).count() > 0)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((ok -- qk).isEmpty, s"oracle without query: ${ok -- qk}")
    val rowsOnly = qk -- ok
    // EVERY query is oracle-checked — the last two rows-only entries
    // (the engine-specific sketch twins) became bound-certification
    // rows in r10: exact side + within_bound boolean, both
    // DuckDB-mirrored
    assert(rowsOnly.isEmpty, s"unexpected rows-only: $rowsOnly")
  }
}
