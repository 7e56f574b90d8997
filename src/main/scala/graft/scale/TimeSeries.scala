package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed time grid and forward-fill the gaps.
  *
  * Sensor/telemetry/metrics feeds arrive irregularly; most downstream
  * consumers (feature windows, sequence models, monitoring rules) want one
  * row per (key, bucket) with no holes. The reference's workload keeps
  * per-patient observation streams with exactly this shape problem
  * (`/root/reference/Glue_tranformation_json_parquet.py:150-168` emits
  * observation rows keyed by patient at irregular `effectiveDateTime`s).
  *
  * Scale shape (100 TB events):
  *   - bucket aggregation: ONE keyed shuffle, map-side combined — state per
  *     (key, bucket) is a running (sum, count), never the raw events;
  *   - gap filling is CONSTRUCTIONAL, not a join: each observed bucket
  *     emits itself plus the empty buckets up to (not including) the key's
  *     next observed bucket, via `lead` + `sequence` + `posexplode` — so
  *     there is no grid table, no second join shuffle, and the fill value
  *     rides the generating row instead of a `last(ignoreNulls)` scan;
  *   - the only window is per-key `lead(1)` over the AGGREGATED buckets
  *     (≤ span/step rows per key, independent keys → linear scale-out).
  *     A key whose longest gap spans millions of steps materializes that
  *     run in one task's explode — callers with such shapes should cap the
  *     fill horizon (bound the sequence length) rather than fabricate
  *     unbounded synthetic history.
  */
object TimeSeries {

  /** Resample `events` to a fixed grid per key (`unit` ∈ Spark
    * `date_trunc` units, e.g. "hour"/"day"): the bucket value is the
    * 6dp-rounded mean of `valueCol` within (key, bucket) — summed through
    * DECIMAL(18,2) so partial-aggregation order can never reach the
    * result, divided and rounded in DOUBLE (both steps exact IEEE,
    * cross-engine reproducible). Missing buckets inside a key's [min, max]
    * span are emitted with the previous observed bucket's value and
    * `is_gap=true`; the first bucket of every key is by construction a
    * real observation, so the fill never reads an undefined value.
    */
  def resampleFfill(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, unit: String = "hour"): DataFrame = {
    val step = expr(s"INTERVAL 1 ${unit.toUpperCase}")
    val agged = events
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(round(
        sum(col(valueCol).cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("bucket_mean"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    agged
      .withColumn("__until",
        coalesce(lead(col("bucket"), 1).over(w) - step, col("bucket")))
      .select(col(keyCol),
        col("bucket_mean"),
        posexplode(sequence(col("bucket"), col("__until"), step))
          .as(Seq("__pos", "bucket")))
      .select(col(keyCol), col("bucket"),
        col("bucket_mean").as("value_ffill"),
        (col("__pos") > 0).as("is_gap"))
  }

  /** Bounded-window exponential moving average per key: for each row, the
    * EWMA over its last `window` observations in `orderCols` order —
    * weight α^0 on the newest back to α^(window−1), normalized by the
    * weights actually present (so early rows use shorter effective
    * windows, no warm-up bias).
    *
    * The textbook recursive EWMA (s_i = α·v_i + (1−α)·s_{i−1}) threads
    * state through every prior row — inherently sequential per key and
    * unbounded history on replay. The bounded-window form is the
    * distributable equivalent (the tail weight beyond `window` rows is
    * α^window ≈ 0 for any practical α): one per-key window with a
    * `window`-row frame, state per row = one ≤ window-element array.
    *
    * Determinism: the frame's `collect_list` is ordered by the (total)
    * window order; weights come from `pow` (exactly reproducible for any
    * α; exact powers of two for α = 0.5); numerator and denominator are
    * LEFT FOLDS over the same pinned order, so partial order never leaks;
    * the quotient rounds to 6dp on both engines.
    */
  def ewmaBounded(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, alpha: Double = 0.5, window: Int = 8): DataFrame = {
    require(window >= 1, "ewma window must be >= 1")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val withArr = df.withColumn("__arr",
      collect_list(col(valueCol)).over(w))
    val n = size(col("__arr"))
    // weight for 0-based position i in the frame (oldest first): α^(n−1−i)
    val weighted = transform(col("__arr"),
      (x, i) => x * pow(lit(alpha), (n - 1 - i).cast("double")))
    val weights = transform(col("__arr"),
      (_, i) => pow(lit(alpha), (n - 1 - i).cast("double")))
    withArr
      .withColumn("ewma", round(
        aggregate(weighted, lit(0d), (acc, x) => acc + x) /
          aggregate(weights, lit(0d), (acc, x) => acc + x), 6))
      .drop("__arr")
  }

  /** Interval-integrity audit per key — the data-quality check every
    * SCD2 / validity-interval table needs before anyone trusts a
    * point-in-time join against it: overlapping rows double-attribute,
    * gaps silently drop history. Per key (intervals as [s, e) integer
    * units, ordered by (s, e)):
    *   - a row OVERLAPS when its start precedes the running max end of
    *     all earlier rows (covers nested and out-of-order intervals,
    *     which a plain lag(e) misses);
    *   - a row opens a GAP when its start exceeds that running max;
    *   - gap_units accumulates the uncovered stretch; covered_units =
    *     span − gaps (exact, by construction).
    *
    * Scale shape: ONE keyed exchange + sort; the running max is a
    * cumulative frame aggregate (O(1) state/row); keys independent →
    * linear scale-out. All arithmetic is int64 — bit-identical
    * cross-engine (q165).
    *
    * Returns (key, n_intervals, n_overlaps, n_gaps, gap_units,
    * span_units, covered_units).
    */
  def intervalAudit(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__pmax", max(col(endCol)).over(w))
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(when(col("__pmax").isNotNull &&
          col(startCol) < col("__pmax"), 1L).otherwise(0L))
          .as("n_overlaps"),
        sum(when(col("__pmax").isNotNull &&
          col(startCol) > col("__pmax"), 1L).otherwise(0L))
          .as("n_gaps"),
        sum(when(col("__pmax").isNotNull &&
          col(startCol) > col("__pmax"),
          col(startCol) - col("__pmax")).otherwise(0L))
          .as("gap_units"),
        (max(greatest(col(endCol), coalesce(col("__pmax"), col(endCol)))) -
          min(col(startCol))).as("span_units"))
      .withColumn("covered_units", col("span_units") - col("gap_units"))
  }

  /** One-sided CUSUM changepoint detection per key — the sequential
    * drift monitor (Page 1954) a pipeline runs over metric/sensor
    * streams to flag level shifts. The recursive statistic
    * S_t = max(0, S_{t−1} + (x_t − target − slack)) is computed in
    * CLOSED FORM as S_t = P_t − min(0, min_{j≤t} P_j) over the
    * deviation prefix sums P — two window passes over ONE per-key sort
    * (same spec, Spark reuses the exchange+sort), no recursion, no UDF.
    *
    * Determinism: values are quantized to integer `unitsPerValue`-ths
    * via floor(x·u + 0.5) — one exact-IEEE multiply/add/floor — and
    * every sum/min/comparison after that is 64-bit integer, so the
    * statistic is bit-identical across engines (floating-point prefix
    * sums would be association-order-dependent; see the fixed-point
    * PageRank contract). Caller supplies target/slack/threshold in the
    * SAME integer units.
    *
    * Scale shape: one hash exchange on the key + one sort; state per
    * row is O(1). Keys are independent — linear scale-out; a single
    * key's history must fit one task's sort (true of any per-entity
    * sequential statistic; shard the key upstream if an entity exceeds
    * ~10^8 events).
    *
    * Returns input keys/order plus (units, s_units, alarm).
    */
  def cusumChangepoints(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, targetUnits: Long, slackUnits: Long,
      thresholdUnits: Long, unitsPerValue: Long = 100L): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("units",
        floor(col(valueCol) * lit(unitsPerValue.toDouble) + lit(0.5)))
      .withColumn("__p",
        sum(col("units") - lit(targetUnits) - lit(slackUnits)).over(cum))
      .withColumn("s_units",
        col("__p") - least(lit(0L), min(col("__p")).over(cum)))
      .withColumn("alarm", col("s_units") > lit(thresholdUnits))
      .drop("__p")
  }

  /** Rolling z-score anomaly flags per key: each value is compared
    * against the mean/std of the PREVIOUS `window` values (the trailing
    * frame excludes the current row — an anomaly must not contaminate
    * its own baseline). Only full windows are scored.
    *
    * Determinism: the z-test |x−μ| > z·σ is evaluated EXACTLY in
    * integers on the quantized units — squared and cross-multiplied to
    * (n·x − S)²·(n−1) > z²·n·(n·Q − S²) with S = Σu, Q = Σu² over the
    * frame — so no division, no sqrt, no floating point anywhere: the
    * flag (and both sides of the inequality, which are emitted for
    * audit) is bit-identical across engines. With unit-scaled magnitudes
    * |u| ≤ 10^6 and n ≤ 100 every term stays far below 2^63.
    *
    * Scale shape: one exchange + one sort per key (all three frame
    * aggregates share the window spec), O(1) state per row.
    */
  def rollingZscoreAnomalies(df: DataFrame, keyCol: String,
      orderCols: Seq[String], valueCol: String, window: Int = 8,
      z: Int = 3, unitsPerValue: Long = 100L): DataFrame = {
    require(window >= 2, "need >= 2 trailing rows for a variance")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, -1)
    val n = lit(window.toLong)
    df.withColumn("units",
        floor(col(valueCol) * lit(unitsPerValue.toDouble) + lit(0.5)))
      .withColumn("__n", count(col("units")).over(w))
      .withColumn("__s", sum(col("units")).over(w))
      .withColumn("__q", sum(col("units") * col("units")).over(w))
      .where(col("__n") === n)
      .withColumn("lhs",
        (n * col("units") - col("__s")) * (n * col("units") - col("__s")) *
          (n - 1))
      .withColumn("rhs",
        lit(z.toLong * z) * n * (n * col("__q") - col("__s") * col("__s")))
      .withColumn("anomaly", col("lhs") > col("rhs"))
      .drop("__n", "__s", "__q")
  }
}
