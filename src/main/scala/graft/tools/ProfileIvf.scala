package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.scale.{Ivf, Similarity}

object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = T.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter(col("vec_id") < 100)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val truth = sets(Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5))
    for (k <- Seq(16, 32); iters <- Seq(5); nprobe <- Seq(4, 6, 8, 10, 12)) {
      if (nprobe <= k) {
        val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", 64, k, iters)
        val approx = sets(Ivf.ivfTopK(queries, emb, "vec_id", "embedding", 64, 5, cents, k, nprobe))
        val hits = truth.map { case (q, t) => (t intersect approx.getOrElse(q, Set.empty)).size }.sum
        println(f"[ivf] k=$k nprobe=$nprobe recall=${hits.toDouble / (truth.size * 5)}%.3f scan=${nprobe.toDouble/k}%.2f")
      }
    }
    spark.stop()
  }
}
