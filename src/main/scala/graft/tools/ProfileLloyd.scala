package graft.tools

import org.apache.spark.sql.SparkSession

/** Dissect the Lloyd-loop fixed cost seen in q97/q129 (bench ~4s at
  * sf0.1's 2000×64 embeddings — clearly not data-bound). Times each
  * phase separately on a warm session.
  * Usage: runMain graft.tools.ProfileLloyd [sfDir]
  */
object ProfileLloyd {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lloyd] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // hypothesis probes: is the mean-update cost the explode, the assign
    // expression, or assign-recomputed-per-exploded-row?
    {
      import org.apache.spark.sql.functions._
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      val e = emb.select(col("vec_id").as("__id"),
        transform(col("embedding"), x => x.cast("double")).as("__v")).persist()
      e.count()
      val cents = e.orderBy(col("__id")).limit(4)
        .collect().map(_.getSeq[Double](1).toArray)
      def assign = {
        val dists = array(cents.toIndexedSeq.map { c =>
          aggregate(
            zip_with(col("__v"), array(c.toIndexedSeq.map(lit): _*),
              (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, z) => acc + z)
        }: _*)
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      (1 to 2).foreach { _ =>
        t("A: assign only, count") {
          e.select(assign.as("c")).groupBy(col("c")).count().collect()
        }
        t("B: explode only, count") {
          e.select(posexplode(col("__v")).as(Seq("p", "x")))
            .groupBy(col("p")).agg(avg(col("x"))).collect()
        }
        t("C: assign + explode (current)") {
          e.select(assign.as("c"), posexplode(col("__v")).as(Seq("p", "x")))
            .groupBy(col("c"), col("p")).agg(avg(col("x"))).collect()
        }
        t("D: assign materialized, then explode") {
          val assigned = e.select(col("__v"), assign.as("c"))
            .localCheckpoint(true)
          assigned
            .select(col("c"), posexplode(col("__v")).as(Seq("p", "x")))
            .groupBy(col("c"), col("p")).agg(avg(col("x"))).collect()
        }
      }
      e.unpersist()
    }

    (1 to 3).foreach { run =>
      println(s"--- run $run")
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      t("iters=1 (seed assign only)") {
        graft.scale.Clustering
          .lloydAssignments(emb, "vec_id", "embedding", k = 4, iters = 1)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      t("iters=2 (one mean update)") {
        graft.scale.Clustering
          .lloydAssignments(emb, "vec_id", "embedding", k = 4, iters = 2)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
      t("iters=4") {
        graft.scale.Clustering
          .lloydAssignments(emb, "vec_id", "embedding", k = 4, iters = 4)
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
