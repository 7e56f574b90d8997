package graft

/** Drives the driver-facing contract surface exactly as the harness does. */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a DuckDB oracle (zero rows-only since round 4)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    // q26/q40 gained oracles via the engine-portable hash family; nothing
    // may silently drop back to a rows-only check
    assert((q -- o) == Set.empty[String])
  }

  test("oracle SQL map has no blank statements") {
    SparkEntry.oracleSql.values.foreach(s => assert(s.trim.nonEmpty))
  }
}
