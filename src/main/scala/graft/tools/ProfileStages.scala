package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Generic stage-level profiler: run one named suite query through the
  * noop sink with a listener, print every completed stage's wall time,
  * task count, input/shuffle volumes — the "which stage is slow" loop of
  * guide §7.1 without a UI. Dev tool, not part of the driver contract.
  * Usage: runMain graft.tools.ProfileStages <sfDir> <queryPrefix> [runs]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Int, Long, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages += ((si.stageId, wall, si.numTasks,
          si.taskMetrics.executorRunTime,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.name.take(90)))
      }
    })
    val fn = SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(qname)).getOrElse(sys.error(s"no query $qname"))
    println(s"== ${fn._1} ==")
    for (r <- 1 to runs) {
      stages.clear()
      val t0 = System.nanoTime()
      val df = fn._2(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      if (sys.env.get("PROFILE_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString.take(12000))
      spark.catalog.clearCache()
      // give the listener bus a moment to drain
      Thread.sleep(1500)
      println(f"-- run $r: total $total%.2f s, ${stages.size} stages --")
      stages.sortBy(-_._2).take(18).foreach {
        case (id, wall, nt, run, sr, sw, name) =>
          println(f"  stage $id%4d wall ${wall / 1000.0}%7.2f s tasks $nt%4d " +
            f"cpu ${run / 1000.0}%8.2f s shufR ${sr / 1e6}%8.1f MB " +
            f"shufW ${sw / 1e6}%8.1f MB  $name")
      }
    }
    spark.stop()
  }
}
