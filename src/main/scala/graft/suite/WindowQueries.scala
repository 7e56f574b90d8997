package graft.suite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}

/** Window / ranking / sessionization queries — SURVEY.md §2 rows W1-W3, A6,
  * O1-O2, D1, F6, F9/M9.
  *
  * Scale notes: each window partitions by a high-cardinality key
  * (user_id, (user_id, event_type)) so the single exchange distributes
  * evenly; no global windows except the final display ORDER BY. Skewed
  * users would be handled by AQE skew-split on the exchange.
  */
object WindowQueries {

  /** W1 — the reference's load-bearing "latest value per (patient, analyte)"
    * idiom (Athena_queries_for_reports.sql:8,29) over events: row_number
    * desc-ordered, rn = 1, with a unique tiebreak for determinism.
    */
  private val q11 = GQuery(
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      T.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type",
          round($"value", 2).as("latest_value"),
          unix_micros($"ts").as("ts_us"))
        .orderBy($"user_id", $"event_type")
    },
    Some("""SELECT user_id, event_type, ROUND(value, 2) AS latest_value,
      epoch_us(ts) AS ts_us
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** O2 — per-group top-k (reference: top-3 penalties, mrp_website.py:495). */
  private val q12 = GQuery(
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"value".desc, $"event_id".asc)
      T.events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"event_type", $"rk".cast("long").as("rk"), $"event_id",
          round($"value", 2).as("value"))
        .orderBy($"event_type", $"rk")
    },
    Some("""SELECT event_type, rk, event_id, ROUND(value, 2) AS value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        ORDER BY value DESC, event_id ASC) AS rk FROM events)
      WHERE rk <= 3 ORDER BY event_type, rk"""))

  /** Sessionization: 30-minute inactivity gap → session id via lag + running
    * conditional sum — the batch shape of the streaming sessionizer
    * (graft.streaming). Integer microsecond math end-to-end.
    */
  private val q13 = GQuery(
    (s, d) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(wOrd))
        .withColumn("new_session",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_session")
          .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("start_us"),
          max(unix_micros($"ts")).as("end_us"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("session_value"))
        .orderBy($"user_id", $"session_id")
    },
    Some("""WITH flagged AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
            OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
          THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"""))

  /** W3 — first/last-in-window delta (reference trend change,
    * test.py:667-675). min_by/max_by over the event timestamp.
    */
  private val q14 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id")
        .agg(
          round(min_by($"value", unix_micros($"ts") * lit(1000L) + $"event_id" % 1000L), 2).as("first_value"),
          round(max_by($"value", unix_micros($"ts") * lit(1000L) + $"event_id" % 1000L), 2).as("last_value"))
        .withColumn("delta", round($"last_value" - $"first_value", 2))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
      ROUND(ARG_MIN(value, epoch_us(ts) * 1000 + event_id % 1000), 2) AS first_value,
      ROUND(ARG_MAX(value, epoch_us(ts) * 1000 + event_id % 1000), 2) AS last_value,
      ROUND(ROUND(ARG_MAX(value, epoch_us(ts) * 1000 + event_id % 1000), 2)
        - ROUND(ARG_MIN(value, epoch_us(ts) * 1000 + event_id % 1000), 2), 2) AS delta
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** F6/A6 — monthly regroup (reference monthly wellness series,
    * mrp_website.py:787-798): date_trunc to month + per-month aggregates.
    */
  private val q15 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .withColumn("month", date_format(date_trunc("month", $"ts"), "yyyy-MM"))
        .groupBy($"month", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy($"month", $"event_type")
    },
    Some("""SELECT STRFTIME(DATE_TRUNC('month', ts), '%Y-%m') AS month, event_type,
      COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY month, event_type ORDER BY month, event_type"""))

  /** F9/M9 — closed-form OLS trend per series (reference forecast,
    * mrp_website.py:660-698): regr_slope/intercept on day-unit x for
    * numerically stable, roundable coefficients.
    */
  private val q16 = GQuery(
    (s, d) => {
      import s.implicits._
      val x = (unix_micros($"ts") - lit(1704067200000000L)).cast("double") / lit(86400e6)
      T.events(s, d)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(regr_slope($"value", x), 5).as("slope_per_day"),
          round(regr_intercept($"value", x), 3).as("intercept"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
      ROUND(REGR_SLOPE(value, (epoch_us(ts) - 1704067200000000) / 86400000000.0), 5) AS slope_per_day,
      ROUND(REGR_INTERCEPT(value, (epoch_us(ts) - 1704067200000000) / 86400000000.0), 3) AS intercept
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** D1 — deterministic dropDuplicates (reference dedups each entity on id,
    * Glue_tranformation_json_parquet.py:92,116,137,183): keep the lowest
    * doc_id per (lang, source) via the same W1 window, not the
    * order-dependent dropDuplicates.
    */
  private val q17 = GQuery(
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id".asc)
      T.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"lang", $"source", $"doc_id", $"n_chars")
        .orderBy($"lang", $"source")
    },
    Some("""SELECT lang, source, doc_id, n_chars
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
        ORDER BY doc_id ASC) AS rn FROM documents)
      WHERE rn = 1 ORDER BY lang, source"""))

  /** q12's semantics through the custom whole-operator path
    * ([[graft.plans.TopKPerGroup]]: logical node → strategy → partial/
    * final physical heaps) instead of a window rank — the shuffle
    * carries at most k×groups rows per input partition, not the corpus.
    * Same oracle subquery as q12, so the custom physical operator is
    * hash-matched against DuckDB's window semantics.
    */
  private val q63 = GQuery(
    (s, d) => {
      import s.implicits._
      graft.plans.TopKPerGroup(
        T.events(s, d).select($"event_type", $"event_id", $"value"),
        Seq("event_type"), Seq($"value".desc, $"event_id".asc), 3)
        .select($"event_type", $"event_id", round($"value", 2).as("value"))
        .orderBy($"event_type", $"event_id")
    },
    Some("""SELECT event_type, event_id, ROUND(value, 2) AS value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        ORDER BY value DESC, event_id ASC) AS rk FROM events)
      WHERE rk <= 3 ORDER BY event_type, event_id"""))

  def all: Map[String, GQuery] = Map(
    "q11_latest_per_group" -> q11,
    "q12_topk_per_group" -> q12,
    "q13_sessionize" -> q13,
    "q14_first_last_delta" -> q14,
    "q15_monthly_rollup" -> q15,
    "q16_ols_trend" -> q16,
    "q17_dedup_keep_first" -> q17,
    "q63_topk_custom_operator" -> q63,
  )
}
