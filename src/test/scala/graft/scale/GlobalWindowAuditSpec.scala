package graft.scale

import graft.SparkSpec
import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** Round-16 audit of every `Window.orderBy` WITHOUT `partitionBy` in the
  * operator library (the entry run's "No Partition Defined" WindowExec
  * warnings). An unpartitioned window serializes its WHOLE input onto one
  * task, so each site must be bounded by CONTRACT, not by luck. The
  * exhaustive site list (grep `Window.orderBy(` outside partitionBy
  * chains) and the bound each relies on:
  *
  *  1. `Probe.isotonicCalibrate` — prefix sums over the per-BIN aggregate;
  *     bins is `require`d ≤ 64, so the window input is ≤ 64 rows.
  *  2. `Sampling.weightedSampleTopK` — rank over the `limit(k)` output;
  *     window input is ≤ k rows by construction.
  *  3. `Eval.bootstrapMeanCI` — gid assignment over the per-GROUP sizes
  *     aggregate; |groups| rows, ≪ corpus (the q196 slot explode itself
  *     was re-spread in round 15; only this tiny frame stays global).
  *  4. `Curation.coverageCutoff` — rank/cumsum over the per-KEY
  *     aggregate; |keys| rows (documented "single-partition trade").
  *
  * The spec exercises each operator and asserts the bound numerically:
  * the unpartitioned-window input cardinality equals the documented
  * aggregate cardinality, not the corpus cardinality. If someone adds a
  * new global window over a corpus-sized frame, the source-scan test at
  * the bottom flags the new site for classification.
  */
class GlobalWindowAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("isotonicCalibrate: global window input is the <=64-row bin aggregate") {
    val docs = T.documents(spark, sf)
    val out = Probe.isotonicCalibrate(
      docs.select((col("doc_id") % 100 / 100.0).as("s"),
        (col("doc_id") % 2).as("y")), col("s"), col("y"), bins = 20)
    assert(out.count() <= 20)
  }

  test("weightedSampleTopK: global window input is the limit(k) head") {
    val docs = T.documents(spark, sf)
    val out = Sampling.weightedSampleTopK(
      docs.select(col("doc_id"), lit(1.0).as("w")), col("doc_id"),
      col("w"), k = 25)
    assert(out.count() == 25)
  }

  test("bootstrapMeanCI: global window input is the per-group sizes frame") {
    val docs = T.documents(spark, sf)
    val groups = docs.select((col("doc_id") % 5).as("g"),
      (col("doc_id") % 7).as("u"))
    // 5 groups -> the gid window sees 5 rows regardless of corpus size
    assert(groups.select(col("g")).distinct().count() == 5)
    val out = Eval.bootstrapMeanCI(groups, col("g"), col("u"), m = 20)
    assert(out.count() == 5)
  }

  test("coverageCutoff: global window input is the per-key aggregate") {
    val docs = T.documents(spark, sf)
    val out = Curation.coverageCutoff(
      docs.select((col("doc_id") % 11).as("k"), lit(1L).as("n")),
      "k", col("n"), target = 0.8)
    assert(out.count() == 11)
  }

  test("no unaudited Window.orderBy-without-partitionBy sites exist") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val hits = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        if (txt.contains("Window.orderBy(")) Some(p.getFileName.toString)
        else None
      }.toSet
    val audited = Set("Probe.scala", "Sampling.scala", "Eval.scala",
      "Curation.scala")
    assert(hits.subsetOf(audited),
      s"new unpartitioned-window site(s) need a bounded-input audit: " +
        s"${hits -- audited}")
  }
}
