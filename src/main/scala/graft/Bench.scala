package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point: times every suite query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - each query is forced through a `noop`-format write rather than
  *    `count()` — count() lets Catalyst prune the final projection, so a
  *    narrow map query (e.g. a regexp-extract or fingerprint projection)
  *    would be timed as a bare scan; the noop sink materializes every
  *    output column, which is the honest cost of the operator;
  *  - min-of-RUNS per query (JVM/codegen/page-cache noise showed ±20%
  *    run-to-run swings on unchanged queries between rounds; the min is
  *    the stable "cost of the plan" estimator);
  *  - a query whose force() throws is recorded as -1.0 and listed in
  *    `failed` — never as its time-to-failure, which would let a crashing
  *    query masquerade as a fast one;
  *  - the cache is cleared between queries: operators that persist
  *    internally (e.g. Dedup.minhashDupPairs' signature frame) document
  *    unpersisting as the caller's job — the bench is a caller. Without
  *    this, storage accumulates monotonically across the full run and
  *    inflates co-resident queries (judge-measured r3: q21 = 0.86 s
  *    isolated vs 4.71 s in-bench).
  */
object Bench {
  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // JVM/codegen warmup so the first measured query doesn't absorb
    // session-startup cost (it showed as +4-5s on whichever query ran first)
    try SparkEntry.queries.headOption.foreach(q => force(q._2(spark, sfDir)))
    catch { case _: Throwable => () }
    spark.catalog.clearCache()

    // dev knob: SPARK_GRAFT_ONLY=q41,q46 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(keys) => SparkEntry.queries.filter { case (n, _) => keys.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to Runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
        finally spark.catalog.clearCache()
      }
      // clearCache drains Dataset.persist storage; localCheckpoint RDD
      // blocks (the CC loop's per-round checkpoints) are only freed when
      // the ContextCleaner GCs the dropped references — nudge it BETWEEN
      // queries so block storage can't drift across the suite. (Not
      // between runs: the cleaner's async block-removal RPCs would then
      // overlap the next timed run and inflate it ~10%.)
      System.gc()
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val failed = results.collect { case (n, t) if t < 0 => n }.toSeq.sorted
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$Runs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
