package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timer for individual registry queries, isolated the same way the
  * bench isolates them (clearCache between queries). Not part of the
  * driver contract. Usage:
  *   runMain graft.tools.TimeQueries <sfDir> [qname ...]
  * No names → every query in SparkEntry.queries.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = if (names.isEmpty) graft.SparkEntry.queries
      else graft.SparkEntry.queries.view.filterKeys(names.contains).toMap
    var total = 0.0
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          println(f"[time] $name%-28s FAILED: ${e.getMessage.take(120)}"); -1L }
      finally spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      total += sec
      println(f"[time] $name%-28s $sec%8.2f s  rows=$n")
    }
    println(f"[time] TOTAL $total%.2f s")
    spark.stop()
  }
}
