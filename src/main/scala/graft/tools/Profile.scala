package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.scale.{Dedup, TextOps}

/** Dev micro-profiler for individual operator stages (not part of the
  * driver contract). Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = T.documents(spark, sfDir)
    time("docs count")(docs.count())
    val toks = docs.select(col("doc_id").as("id"),
      TextOps.tokens(col("text")).as("toks"))
    time("tokens")(toks.agg(sum(size(col("toks")))).collect())
    val th = toks.withColumn("th", transform(col("toks"), t => xxhash64(t)))
      .select(col("id"), col("th"))
    time("token hashes")(th.agg(sum(size(col("th")))).collect())
    val sh = th.withColumn("sh", Dedup.hashedShingles(col("th"), 3))
      .select(col("id"), col("sh"))
    time("hashed shingles")(sh.agg(sum(size(col("sh")))).collect())
    val xs = sh.withColumn("xs", transform(col("sh"), x => pmod(x, lit(2147483647L))))
    val sig = xs.withColumn("sig", Dedup.minhashSignature(col("xs"), 64))
      .select(col("id"), col("sig"))
    time("minhash signature")(sig.agg(sum(size(col("sig")))).collect())
    val banded = sig.select(col("id"),
      explode(Dedup.bandKeys(col("sig"), 16, 4)).as("bk"))
    time("band keys")(banded.count())
    time("full minhashDupPairs")(
      Dedup.minhashDupPairs(docs, "doc_id", "text").count())
    time("full again (cache warm?)")(
      Dedup.minhashDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
