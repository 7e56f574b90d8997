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
  *  - **each query runs in its OWN SparkSession/SparkContext** (torn down
  *    and rebuilt between queries; startup is outside the timed window).
  *    The shared-session runs of r3-r5 never produced credible per-query
  *    numbers: clearCache releases Dataset persists but localCheckpoint
  *    RDD blocks, shuffle files, and the ContextCleaner's async removal
  *    queue all drift monotonically across a 63-query × 3-run session —
  *    judge-measured r5: q41 = 4.2 s warm-isolated vs 40.6 s in-bench
  *    (10×), q14 = 0.5 s vs 5.9 s. A context restart clears the block
  *    manager, shuffle dirs, and cleaner queue by construction; the
  *    JVM-global Janino codegen cache survives, so the ~2 s rebuild is
  *    the only overhead and it is never timed. Codegen/first-job session
  *    warmup is absorbed by a throwaway range job plus run 1; min-of-3
  *    picks the warm runs. `SPARK_GRAFT_SHARED=1` restores the old
  *    single-session mode for quick dev loops.
  */
object Bench {
  private val Runs = 3

  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bring up executor threads, noop committer, codegen paths before
    // the first timed run
    spark.range(100000).selectExpr("sum(id) as s")
      .write.mode("overwrite").format("noop").save()
    spark
  }

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Seconds, min over Runs, or -1.0 if every run threw. */
  private def time(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
    val times = (1 to Runs).flatMap { _ =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
      finally spark.catalog.clearCache()
    }
    if (times.isEmpty) -1.0 else times.min
  }

  /** 3 decimals: ms precision keeps the one-line JSON compact, safely
    * inside the harness's stdout tail window (r5's full-precision line
    * overflowed it and the head was truncated → unparseable).
    */
  private def fmt(t: Double): String =
    if (t < 0) "-1.0"
    else BigDecimal(t).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** "q64_sequence_packing" → "q64". The harness's stdout tail window is
    * ~2 KB; r6's line used full query names (75 × ~30 chars ≈ 2.6 KB) and
    * the head — including `"metric":"total","value":…` — was truncated
    * away, leaving `parsed: null`. Short keys bound the final line at
    * ~1.2 KB for 75 queries; the full-name breakdown is printed on its own
    * (truncatable) line just before it for human readers.
    */
  private def shortKey(name: String): String = {
    val cut = name.indexOf('_')
    if (cut > 0) name.substring(0, cut) else name
  }

  /** Remove graft_* scratch dirs left in java.io.tmpdir by earlier runs
    * (bucketed tables, sink round-trips, checkpoints). Runs once, before
    * any timed window: the r6->r7 bench saw q54/q55 drift up to 9-15x and
    * the prime suspect was stale tmp state accumulating across rounds —
    * starting from a clean slate makes each round's write-path timings
    * comparable.
    */
  private def cleanScratch(): Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    // never delete the corpus under test: the sf1 scaling probe reads a
    // MakeScale output that also lives in tmpdir under a graft_* name
    val sfDir = new java.io.File(sys.env.getOrElse(
      "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).getCanonicalPath
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("graft_"))
      .filterNot(f => sfDir.startsWith(f.getCanonicalPath))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    cleanScratch()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shared = sys.env.get("SPARK_GRAFT_SHARED").contains("1")

    // dev knob: SPARK_GRAFT_ONLY=q41,q46 times just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = (only match {
      case Some(keys) => SparkEntry.queries.filter { case (n, _) => keys.exists(n.startsWith) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)

    var spark = newSession(cpus)
    val results = selected.map { case (name, fn) =>
      if (!shared) {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        spark = newSession(cpus)
      }
      name -> time(spark, sfDir, fn)
    }
    val failed = results.collect { case (n, t) if t < 0 => n }.sorted
    val failedJson = failed.map("\"" + shortKey(_) + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full-name breakdown for humans first — the tail window may truncate
    // its head, which loses nothing the compact line below doesn't carry.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"detail":"full-names","queries":$fullQs}""")
    // The machine-parseable line LAST, short keys, `value` at the END so a
    // head-truncation can never eat the total before the queries map.
    val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","unit":"sec","runs":$Runs,"sf":"$sfDir","failed":$failedJson,"queries":$qs,"value":${fmt(total)}}""")
    spark.stop()
  }
}
