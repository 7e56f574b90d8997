package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: run one registered query by prefix and either print rows or the
  * full stack trace — Bench/Verify swallow exceptions by design, so this is
  * the fastest way to diagnose a query that fails in the round harness.
  *
  *   sbt "runMain graft.tools.RunOne q06 /root/testdata/sf0.01"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("q01").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"=== $name ===")
        try {
          val df = fn(spark, sfDir)
          println(s"rows=${df.count()}")
        } catch { case e: Throwable => failed ::= name; e.printStackTrace() }
        finally spark.catalog.clearCache()
      }
    println(if (failed.isEmpty) "ALL OK" else s"FAILED: ${failed.reverse.mkString(",")}")
    spark.stop()
  }
}
