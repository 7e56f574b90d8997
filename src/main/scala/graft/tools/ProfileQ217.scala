package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
      println(f"STAGE $tag%-16s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r"); r
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("p217c").toString
    val buckets = 64
    val stale = docs.where(col("doc_id") % 2 === 0)
      .withColumn("text", when(col("doc_id") % 20 === 2,
        concat(col("text"), lit(" stale stale stale"))).otherwise(col("text")))
    val idx = graft.scale.Dedup.jaccardIndex(stale, "doc_id", "text", 2)
    t("idx_count") { idx.count() }
    val store = graft.scale.Dedup.containmentPostingStore(idx, buckets)
    t("store_count") { store.count() }
    t("store_noop") { store.write.mode("overwrite").format("noop").save(); 0 }
    t("store_repart_noop") { store.repartition(col("bucket")).write.mode("overwrite").format("noop").save(); 0 }
    t("store_write_flat") { store.write.mode("overwrite").parquet(s"$dir/flat"); 0 }
    t("store_write_part") { store.repartition(col("bucket")).write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/store"); 0 }
    spark.stop()
  }
}
