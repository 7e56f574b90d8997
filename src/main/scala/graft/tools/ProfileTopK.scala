package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

/** Dev micro-profiler: TopKPerGroup (whole-operator, partial/final
  * heaps) vs the composable window form (`row_number over (partition by
  * g order by o) <= k`) across group cardinalities, to pin where the
  * custom operator wins and where its no-codegen, row-copying partial
  * stops paying (the r5 verdict's q63 scrutiny item). Synthetic input so
  * group count is a controlled variable at fixed row count.
  *
  * Usage: runMain graft.tools.ProfileTopK [rows] [k]
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(f"rows=$n k=$k cpus=$cpus  (min of 3, seconds)")
    println(f"${"groups"}%10s ${"custom"}%8s ${"window"}%8s  winner")
    for (groups <- Seq(100L, 10000L, 100000L, 1000000L, 5000000L)) {
      val base = spark.range(n).select(
        pmod(hash(col("id")), lit(groups)).cast("long").as("g"),
        col("id").as("v"),
        pmod(hash(col("id"), lit(7)), lit(1000000)).as("o"))
      val custom = TopKPerGroup(base, Seq("g"),
        Seq(col("o").asc, col("v").asc), k)
      val window = base.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("o"), col("v"))))
        .filter(col("rn") <= k).drop("rn")
      val tc = (1 to 3).map(_ => force(custom)).min
      val tw = (1 to 3).map(_ => force(window)).min
      val who = if (tc < tw) "custom" else "window"
      println(f"$groups%10d $tc%8.2f $tw%8.2f  $who")
    }
    spark.stop()
  }
}
