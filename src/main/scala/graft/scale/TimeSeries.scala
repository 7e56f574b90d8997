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
}
