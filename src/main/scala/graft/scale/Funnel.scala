package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis — the product-analytics staple the
  * reference's event queries stop short of: for each user, the first
  * time each stage of an ordered event-type sequence was reached, where
  * stage i+1 must occur STRICTLY AFTER the user's stage-i time.
  *
  * Scale shape: one pass per stage over events FILTERED to that stage's
  * type (predicate pushdown keeps each pass a fraction of the log), each
  * keyed by user — the per-stage aggregate is map-side combined to one
  * row per user before its shuffle, and every join is user-keyed so AQE
  * plans them co-partitioned after the first. Nothing driver-side; state
  * per user is one timestamp per stage.
  *
  * Determinism: first-touch = MIN(timestamp) per user per stage —
  * duplicate timestamps collapse under MIN; `stage` counts non-null
  * stage times. Strictly-after (`>`) means a same-instant later stage
  * does NOT advance the funnel (the conservative convention; document
  * the choice, don't bury it).
  */
object Funnel {

  /** Returns one row per user appearing in the log: `user_id`, one
    * nullable `t<i>_us` epoch-micros column per stage (1-based, in
    * `stages` order), and `stage` = number of stages reached.
    */
  def firstTouchFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      "stages must be non-empty and distinct")
    val users = events.select(col(userCol).as("user_id")).distinct()
    val withTimes = stages.zipWithIndex.foldLeft(users) {
      case (acc, (stageType, i)) =>
        val tCol = s"t${i + 1}_us"
        val stageEvents = events
          .select(col(userCol).as("user_id"), col(typeCol).as("__t"),
            unix_micros(col(tsCol)).as("__us"))
          .where(col("__t") === stageType)
        val firsts =
          if (i == 0)
            stageEvents.groupBy(col("user_id"))
              .agg(min(col("__us")).as(tCol))
          else
            stageEvents
              .join(acc.select(col("user_id"), col(s"t${i}_us")), "user_id")
              .where(col("__us") > col(s"t${i}_us"))
              .groupBy(col("user_id"))
              .agg(min(col("__us")).as(tCol))
        acc.join(firsts, Seq("user_id"), "left")
    }
    val stageCount = stages.indices
      .map(i => when(col(s"t${i + 1}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withTimes.withColumn("stage", stageCount.cast("long"))
  }
}
