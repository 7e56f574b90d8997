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

  /** Cohort retention matrix: users grouped by the day of their FIRST
    * event (the cohort), counted on each subsequent day they were active.
    * One row per (cohort_day, age_days) with the distinct active-user
    * count — the classic retention triangle, and the usage-decay signal
    * a data-mix scheduler reads per source/feature cohort.
    *
    * Shape: the (user, day) activity set collapses FIRST (distinct over
    * narrow rows — at 100 TB this is the big shuffle and it is map-side
    * combinable); cohorts are a per-user MIN over that already-collapsed
    * set (no second pass over raw events); the final count groups
    * (cohort, age) pairs bounded by users × active days. The cohort
    * join is user-keyed and co-partitioned with the activity set after
    * AQE. Never `count(DISTINCT user)` over raw events — the distinct
    * pre-collapse IS the partial aggregation.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val activity = events
      .select(col(userCol).as("user_id"),
        date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("age_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling-active stickiness: per day, DAU (distinct users that day),
    * WAU (distinct users in the trailing `windowDays`-day window ending
    * that day), and the DAU/WAU ratio — the engagement health metric.
    *
    * The naive WAU recomputes a distinct over windowDays of history for
    * EVERY day — windowDays× the scan. The scale shape is a CONTRIBUTION
    * EXPLODE: collapse to distinct (user, day) once, then each activity
    * day contributes itself to the `windowDays` window-ending days it
    * falls in (sequence + explode — ×windowDays narrow row growth), and
    * one distinct-count per window day finishes it. Window days beyond
    * the last observed day are clipped (they'd report partial futures);
    * leading days keep their natural partial windows, exactly like a
    * production dashboard's first week.
    */
  def rollingActiveStickiness(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val activity = events
      .select(col(userCol).as("user_id"),
        date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    val dau = activity.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val maxDay = activity.agg(max(col("day")).as("__max_day"))
    val wau = activity.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        explode(sequence(col("day"),
          least(col("day") + expr(s"INTERVAL ${windowDays - 1} DAYS"),
            col("__max_day")),
          expr("INTERVAL 1 DAY"))).as("wday"))
      .distinct()
      .groupBy(col("wday").as("day"))
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        round(col("dau").cast("double") / col("wau").cast("double"), 6))
  }

  /** Frequent event-path mining: the top `topN` length-`n` consecutive
    * event-type sequences across all users' ordered streams — the
    * "what do users actually do" sequential-pattern report that the
    * Markov matrix (q123) summarizes one step at a time and this
    * surfaces as whole paths.
    *
    * Shape: ONE per-user exchange + sort; the n-gram is `n − 1` lead()
    * columns over that single window spec (no collect_list — a
    * billion-event user never materializes a driver- or row-sized
    * array), a null-guarded concat, then a map-side-combinable count
    * and a TakeOrdered (n desc, path asc) cut. Ordering ties resolve by
    * (ts, event_id) — total, so the paths are engine-exact.
    *
    * Returns (path, n) — `sep`-joined type sequences.
    */
  def frequentPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, n: Int = 3, topN: Int = 25,
      sep: String = ">"): DataFrame = {
    require(n >= 2, s"paths need length >= 2: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val steps = (1 until n).map(i => lead(col(typeCol), i).over(w))
    events
      .withColumn("__last", steps.last)
      .withColumn("__path",
        concat_ws(sep, (col(typeCol) +: steps): _*))
      .where(col("__last").isNotNull)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }
}
