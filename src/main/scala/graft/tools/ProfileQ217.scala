package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the q217 posting-store lifecycle — the tool
  * that isolated the round-14 build-path regression (the Generate-over-
  * unmaterialized-HOF re-evaluation; SCALING.md "Round-14 build-path
  * note"): times index build, store write (bucket-clustered partitioned
  * layout), batch-wins merge, the serve's eager plan-build jobs, and the
  * serve force separately, so a regression pins to one leg instead of
  * the end-to-end number.
  *
  * Usage: java -cp <classes:spark jars> <add-opens> graft.tools.ProfileQ217 [sfDir]
  */
object ProfileQ217 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val s = spark
    val docs = graft.core.Tables.documents(s, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_p217").toString
    val buckets = 64
    val stale = docs.where(col("doc_id") % 2 === 0)
      .withColumn("text", when(col("doc_id") % 20 === 2,
        concat(col("text"), lit(" stale stale stale")))
        .otherwise(col("text")))
    t("store") {
      graft.scale.Dedup.containmentPostingStore(
          graft.scale.Dedup.jaccardIndex(stale, "doc_id", "text", 2), buckets)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/store")
    }
    val reingest = docs.where(col("doc_id") % 2 === 0 &&
      col("doc_id") % 20 === 2)
    t("merge") {
      graft.scale.Dedup.containmentPostingStoreMerge(
          s.read.parquet(s"$dir/store"), reingest, "doc_id", "text", 2,
          buckets)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/merged")
    }
    val served = t("serve_eager") {
      graft.scale.Dedup.containmentAgainstPostingStore(
        s.read.parquet(s"$dir/merged"),
        docs.where(col("doc_id") % 2 === 1 && col("doc_id") <= 100),
        "doc_id", "text", 2, 0.4, buckets)
    }
    t("serve_force") {
      served.orderBy(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
