package graft

/** Forces EVERY SparkEntry.queries entry against the driver's real
  * parquet testdata at sf0.001 — the commit-time twin of the harness's
  * correctness run. The r5 lesson: q64 shipped crashing on parquet-backed
  * tables while 142/142 unit tests stayed green, because nothing in `sbt
  * test` executed the registered queries against real table schemas
  * (PackingSpec's local-relation fixtures resolved by accident). This
  * spec closes that hole: a query that cannot BUILD or FORCE on the real
  * testdata fails its own named test.
  *
  * Forcing uses the same noop-format write as Bench so every output
  * column materializes (count() would let Catalyst prune the projection
  * and skip broken downstream expressions).
  */
class EntryForceSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

  for ((name, build) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"force $name on sf0.001") {
      assume(new java.io.File(sfDir).isDirectory, s"testdata absent: $sfDir")
      build(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
  }
}
