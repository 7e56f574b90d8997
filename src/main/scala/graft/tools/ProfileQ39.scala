package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.scale.{Dedup, Similarity}

object ProfileQ39 {
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
    val emb = T.embeddings(spark, sfDir)
    val n = time("count")(emb.count())
    val bits = math.max(4, math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt)
    println(s"n=$n bits=$bits")
    val v = emb.select(col("vec_id").as("id"), Similarity.toDouble(col("embedding")).as("v"))
    val withSigs = v.withColumn("__sigs", Similarity.sigsNative(col("v"), 64, bits, 16))
    time("signatures only")(withSigs.agg(sum(element_at(col("__sigs"), 1))).collect())
    val home = withSigs.withColumn("tb", explode(array((0 until 16).map { t =>
        struct(lit(t).as("t"), element_at(col("__sigs"), t + 1).as("bucket")) }: _*)))
      .select(col("id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    time("home keys")(home.count())
    val probed = withSigs.withColumn("tb", explode(array((0 until 16).flatMap { t =>
        val sig = element_at(col("__sigs"), t + 1)
        val probes = sig +: (0 until bits).map(i => sig.bitwiseXOR(lit(1L << i)))
        probes.map(b => struct(lit(t).as("t"), b.as("bucket"))) }: _*)))
      .select(col("id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    time("probe keys")(probed.count())
    val candidates = probed.as("l").join(home.as("r"),
        col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.id") =!= col("r.id"))
      .select(least(col("l.id"), col("r.id")).as("id_a"),
        greatest(col("l.id"), col("r.id")).as("id_b"))
    time("raw candidates")(println("raw=" + candidates.count()))
    val dist = candidates.distinct()
    time("distinct candidates")(println("dist=" + dist.count()))
    val full = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", 64, 0.4, bits, 16, true)
    time("full operator")(println("pairs=" + full.count()))
    spark.stop()
  }
}
