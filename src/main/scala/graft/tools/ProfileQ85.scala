package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.scale.{Dedup, TextOps}

/** Dev micro-profiler for the q85 exact-Jaccard prefix filter (not part of
  * the driver contract): measures the candidate-pair workload of the
  * hash-ordered prefix (what ngramJaccardPairs ships) against the
  * document-frequency-ordered prefix (the PPJoin refinement its scaladoc
  * defers), on both the raw corpus and a boilerplate-heavy variant where
  * every document shares an identical 30-token header+footer — the exact
  * condition under which prefixes collide on common shingles.
  *
  * Workload metric: sum over prefix buckets of c·(c−1)/2 — the number of
  * join-stage pair comparisons before any dedup/verify — plus the max
  * bucket size (the skew the triangle split must absorb). DF ordering is
  * worth its global aggregation only if it cuts this sum materially.
  *
  * Usage: runMain graft.tools.ProfileQ85 [sfDir] [shingleSize] [threshold]
  */
object ProfileQ85 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shingleN = args.lift(1).map(_.toInt).getOrElse(3)
    val thr = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $l%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val boiler = (1 to 30).map(i => s"boilerplate$i").mkString(" ")
    val raw = T.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val heavy = raw.select(col("doc_id"),
      concat_ws(" ", lit(boiler), col("text"), lit(boiler)).as("text"))

    for ((label, docs) <- Seq("raw" -> raw, "boilerplate" -> heavy)) {
      println(s"=== corpus: $label ===")
      // shingle sets, identical to ngramJaccardPairs (shingleN, thr)
      val sh = docs
        .select(col("doc_id").as("id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("th", Dedup.xxhashTokens(col("toks")))
        .withColumn("sh", sort_array(array_distinct(
          Dedup.hashedShingles(col("th"), shingleN))))
        .select(col("id"), col("sh"))
        .localCheckpoint()
      val tNum = math.floor(thr * 1e6).toLong; val tDen = 1000000L
      val n = size(col("sh")).cast("long")
      val ceilTn = call_function("div", n * tNum + (tDen - 1), lit(tDen))
      val prefixLen = (n - ceilTn + 1).cast("int")

      def report(name: String, pref: DataFrame): Unit = {
        val agg = pref.groupBy("bk").count()
          .agg(count(lit(1)).as("buckets"), max("count").as("max_bucket"),
            sum(expr("count * (count - 1) / 2")).as("pair_work"))
          .collect().head
        println(s"  [$name] buckets=${agg.get(0)} max_bucket=${agg.get(1)} " +
          s"pair_work=${agg.get(2)}")
      }

      // pre-r9 baseline: plain hash-ordered prefix (the shipped path now
      // reorders hot shingles last; its cost shows in the full-run timing)
      report("hash-order", sh.select(col("id"),
        explode(slice(col("sh"), lit(1), greatest(prefixLen, lit(0)))).as("bk")))

      // PPJoin refinement: global DF, order each set rare-first, re-slice
      val exploded = sh.select(col("id"), col("sh"), prefixLen.as("plen"),
        explode(col("sh")).as("t"))
      val dfs = exploded.groupBy("t").agg(count(lit(1)).as("df"))
      val dfOrdered = exploded.join(dfs, "t")
        .groupBy("id").agg(first("plen").as("plen"),
          array_sort(collect_list(struct(col("df"), col("t")))).as("ord"))
        .select(col("id"), explode(slice(transform(col("ord"),
          s => s.getField("t")), lit(1), greatest(col("plen"), lit(0)))).as("bk"))
      report("df-order ", dfOrdered)

      time(s"full ngramJaccardPairs ($label)") {
        val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN, thr, 1024)
        println(s"    pairs = ${p.count()}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
