package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.scale.Dedup

/** Stage timer for commonRunPairs (dev only): raw kernel throughput,
  * fingerprint volume, and cold-cache operator cost.
  */
object ProfileQ71 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val texts = docs.select(col("text")).collect().map(_.getString(0))
    val t0 = System.nanoTime()
    var selections = 0L
    texts.foreach { s =>
      selections += graft.functions.NativeExpressions.winnowContexts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 16, 8)
        .numElements()
    }
    println(f"[stage] raw kernel (1 thread)          ${(System.nanoTime() - t0) / 1e9}%.2f s  ($selections selections)")
    val fp = docs.select(col("doc_id").as("id"),
      explode(graft.functions.NativeExpressions
        .winnow_contexts(col("text"), 16, 8)).as("f"))
    time("fingerprint rows (warmup)") { fp.count() }
    time("fingerprint rows") { println("fp: " + fp.count()) }
    time("full operator (run1)") {
      println("pairs: " +
        Dedup.commonRunPairs(docs, "doc_id", "text", 16, 8).count())
    }
    time("full operator (run2)") {
      Dedup.commonRunPairs(docs, "doc_id", "text", 16, 8).count()
    }
    spark.stop()
  }
}
