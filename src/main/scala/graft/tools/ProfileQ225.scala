package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Dev micro-profiler for q225's stages (not part of the driver
  * contract). Usage: runMain graft.tools.ProfileQ225 <sfDir>
  */
object ProfileQ225 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = T.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val partner = docs.select(col("doc_id").as("pid"),
      col("text").as("ptext"))
    val mixed = docs
      .withColumn("pid", col("doc_id").bitwiseXOR(lit(1L)))
      .join(partner, "pid")
      .select(col("doc_id"),
        concat(col("text"), lit("\n\n"), col("ptext"), lit("\n\n"),
          col("text")).as("text"))

    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      time("mixed fixture")(noop(mixed))
      val counts = graft.functions.NativeExpressions
        .char_ngram_bucket_counts(col("text"), 3, 4096)
      time("kernel over train docs")(noop(docs.select(explode(counts))))
      time("kernel over mixed")(noop(mixed.select(explode(counts))))
      val paras = mixed.select(col("doc_id"),
          posexplode(split(col("text"), java.util.regex.Pattern.quote("\n\n")))
            .as(Seq("idx", "text")))
        .where(length(trim(col("text"))) > 0)
      time("paras explode")(noop(paras))
      time("kernel over paras")(noop(paras.select(explode(counts))))
      val seg = graft.scale.Classify.langIdSegmentParagraphs(
        docs, mixed, "doc_id", "lang", "text", n = 3, buckets = 4096)
      time("langIdSegmentParagraphs full")(noop(seg))
      time("q225 full (with orderBy)")(noop(seg.orderBy(col("doc_id"))))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
