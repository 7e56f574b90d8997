package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.scale.Dedup

/** Dev micro-profiler for the q41/q46 clustering path (not part of the
  * driver contract). Usage: runMain graft.tools.ProfileQ41 <sfDir>
  */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[t] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = T.documents(spark, sfDir)
    val pairs = time("minhashDupPairs") {
      val p = Dedup.minhashDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.8, 1024)
      println(s"    pairs = ${p.count()}")
      p
    }
    time("connectedComponents") {
      val (c, rounds) = Dedup.ccProbe(docs.select(col("doc_id").as("id")), pairs)
      println(s"    rows = ${c.count()}, rounds = $rounds")
    }
    for (i <- 1 to 2) time(s"full q41 run $i") {
      Dedup.nearDupClusters(docs, "doc_id", "text", 3, 64, 16, 0.8, 1024)
        .orderBy(col("id")).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
