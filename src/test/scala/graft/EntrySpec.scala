package graft

/** Drives the driver-facing contract surface exactly as the harness does. */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    // rows-only exceptions are the hash-based ops
    assert((q -- o) == Set("q26_simhash_fingerprint", "q40_simhash_dup_pairs"))
  }

  test("oracle SQL map has no blank statements") {
    SparkEntry.oracleSql.values.foreach(s => assert(s.trim.nonEmpty))
  }
}
