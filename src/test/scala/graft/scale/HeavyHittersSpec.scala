package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: token t_i appears ~N/i times, i = 1..80. */
  private def zipfDocs = {
    val words = (1 to 80).flatMap(i => Seq.fill(800 / i)(s"t$i"))
    // deterministic shuffle-free interleave across 6 docs
    val docs = words.zipWithIndex.groupBy(_._2 % 6).toSeq.sortBy(_._1)
      .map { case (id, ws) => (id.toLong, ws.map(_._1).mkString(" ")) }
    spark.createDataFrame(docs).toDF("doc_id", "text").repartition(4)
  }

  private def exactTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(explode(TextOps.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token").limit(k)

  test("certified sketch path matches the exact full groupBy") {
    val (got, certified) = TextOps.heavyHittersWithCert(zipfDocs, "text",
      k = 10, capacity = 64)
    assert(certified, "Zipf corpus at capacity 64 must certify")
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exactTopK(zipfDocs, 10).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("flat distribution at tiny capacity falls back and is still exact") {
    // 300 distinct tokens, every count == 3: nothing can certify at
    // capacity 8, and the k-th has plenty of equal-count competitors
    val flat = (0 until 900).map(i => (i.toLong, s"w${i % 300}"))
      .groupBy(_._1 % 5).toSeq.sortBy(_._1)
      .map { case (id, ws) => (id, ws.map(_._2).mkString(" ")) }
    val df = spark.createDataFrame(flat).toDF("doc_id", "text").repartition(3)
    val (got, certified) = TextOps.heavyHittersWithCert(df, "text",
      k = 5, capacity = 8)
    assert(!certified, "flat distribution must not certify at capacity 8")
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exactTopK(df, 5).collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("zero-deficit summary (distinct <= capacity) certifies as the exact count map") {
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val (got, certified) = TextOps.heavyHittersWithCert(df, "text",
      k = 2, capacity = 16)
    assert(certified)
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
  }

  test("deferred variant builds lazily and matches the eager result on Zipf text") {
    // building the plan must run NO jobs (the eager API's distinguishing
    // defect) — count job starts around the construction
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val docs = zipfDocs
    docs.count() // materialize fixture lineage outside the listener window
    spark.sparkContext.addSparkListener(listener)
    val deferred = try {
      val d = TextOps.heavyHittersDeferred(docs, "text", k = 10, capacity = 64)
      Thread.sleep(300) // listener dispatch is async
      assert(jobs.get() == 0, s"plan construction ran ${jobs.get()} jobs")
      d
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(deferred.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      TextOps.heavyHitters(docs, "text", k = 10, capacity = 64).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("MG estimates are undercounts within the deficit bound") {
    val m = 32
    val toks = zipfDocs.select(explode(TextOps.tokens($"text")).as("token"))
    val row = toks.agg(
      graft.functions.NativeExpressions.misra_gries($"token", m).as("mg"),
      count(lit(1)).as("n")).head()
    val summary = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = row.getLong(1)
    val truth = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.size <= m)
    val deficit = n - summary.values.sum
    val bound = deficit / (m + 1L)
    summary.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
      assert(truth(t) - est <= bound,
        s"$t under by ${truth(t) - est} > bound $bound")
    }
    // absent tokens obey the same bound
    truth.foreach { case (t, c) =>
      if (!summary.contains(t)) assert(c <= bound, s"missing $t count $c > $bound")
    }
  }

  test("heavy hitters certify on the real parquet documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val (got, certified) = TextOps.heavyHittersWithCert(docs, "text",
      k = 25, capacity = 2048)
    assert(certified, "sf0.001 documents must certify at capacity 2048")
    assert(got.count() == 25)
  }
}
