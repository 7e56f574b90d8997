package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the q218 exact-span pipeline: times the
  * hash-prefilter pass (old substring form vs the GramHashes kernel),
  * the full detector, and the removal twin, so regressions pin to a leg.
  * Usage: java -cp <classes:jars> <add-opens> graft.tools.ProfileQ218 [sfDir]
  */
object ProfileQ218 {
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
      println(f"STAGE $tag%-18s ${(System.nanoTime()-t0)/1e9}%8.2f s -> $r"); r
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    val L = 30
    val starts = sequence(lit(1), length(col("text")) - (L - 1))
    val oldGrams = docs.where(length(col("text")) >= L)
      .select(col("doc_id"), explode(starts).as("__s"), col("text"))
      .select(col("doc_id"), col("__s"),
        xxhash64(substring(col("text"), col("__s"), lit(L))).as("__h"))
    val newGrams = docs.where(length(col("text")) >= L)
      .select(col("doc_id"), posexplode(graft.functions.NativeExpressions
        .gram_hashes(col("text"), L)).as(Seq("__p", "__h")))
    t("warmup") { docs.count() }
    t("pass1_old") { oldGrams.groupBy(col("__h")).agg(count(lit(1)).as("n")).where(col("n")>1).count() }
    t("pass1_kernel") { newGrams.groupBy(col("__h")).agg(count(lit(1)).as("n")).where(col("n")>1).count() }
    t("full_spans") { graft.scale.Dedup.exactDuplicateSpans(docs, "doc_id", "text", L).count() }
    t("full_spans_warm") { graft.scale.Dedup.exactDuplicateSpans(docs, "doc_id", "text", L).count() }
    t("removal_warm") { graft.scale.Dedup.removeExactDuplicateSpans(docs, "doc_id", "text", L).count() }
    spark.stop()
  }
}
