package graft.suite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.operators.AsOfJoin
import graft.wellness.Forecast

/** Extended operator coverage: as-of join, rollup, exact percentiles,
  * correlation/covariance stats, semi/anti joins, and the grouped OLS
  * forecast — each mirrored in DuckDB.
  */
object ExtendedQueries {

  /** As-of join (point-in-time lookup): every event picks up the latest
    * order of the same user at or before the event time. Spark side is the
    * union-tag-window operator (graft.operators.AsOfJoin — one shuffle,
    * no range explosion); the oracle is DuckDB's native ASOF JOIN. The
    * right side is pre-deduplicated to one row per (key, ts) so the match
    * is well-defined on both engines.
    */
  private val q29 = GQuery(
    (s, d) => {
      import s.implicits._
      val wDedup = Window.partitionBy($"o_custkey", $"o_orderdate")
        .orderBy($"o_orderkey".desc)
      val ordersDedup = T.orders(s, d)
        .withColumn("__rn", row_number().over(wDedup)).filter($"__rn" === 1)
        .drop("__rn")
        .select($"o_custkey".as("user_id"), $"o_orderdate", $"o_orderkey",
          $"o_totalprice")
      val joined = AsOfJoin.asofJoin(
        T.events(s, d), ordersDedup, key = "user_id",
        leftTs = "ts", rightTs = "o_orderdate",
        rightCols = Seq("o_orderkey", "o_totalprice"))
      joined.select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"o_orderkey", round($"o_totalprice", 2).as("order_price"))
        .orderBy($"event_id")
    },
    Some("""WITH r AS (
        SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
          ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
      SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        r.o_orderkey, ROUND(r.o_totalprice, 2) AS order_price
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
      ORDER BY e.event_id"""))

  /** ROLLUP hierarchy totals (OLAP subtotal lattice). Group keys coalesced
    * to '(all)' so the subtotal rows sort deterministically on both engines.
    */
  private val q30 = GQuery(
    (s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total_qty"))
        .select(coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
          coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
          $"n", $"total_qty")
        .orderBy($"returnflag", $"linestatus")
    },
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
        COALESCE(l_linestatus, '(all)') AS linestatus,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the p·(n−1) linear-interpolation
    * definition).
    */
  private val q31 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"),
          round(min($"value"), 2).as("vmin"),
          round(max($"value"), 2).as("vmax"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
        ROUND(quantile_cont(value, 0.5), 4) AS p50,
        ROUND(quantile_cont(value, 0.9), 4) AS p90,
        ROUND(quantile_cont(value, 0.99), 4) AS p99,
        ROUND(MIN(value), 2) AS vmin, ROUND(MAX(value), 2) AS vmax
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Correlation / covariance / dispersion statistics per group (F9's
    * statistical-aggregate family beyond the OLS pair).
    */
  private val q32 = GQuery(
    (s, d) => {
      import s.implicits._
      val x = (unix_micros($"ts") - lit(1704067200000000L)).cast("double") / lit(86400e6)
      T.events(s, d)
        .groupBy($"event_type")
        .agg(
          round(corr($"value", x), 6).as("corr_vs_time"),
          round(covar_samp($"value", x), 4).as("covar"),
          round(stddev_samp($"value"), 4).as("sd"),
          round(var_samp($"value"), 3).as("variance"),
          // Spark skewness is population g1; DuckDB's is the sample-adjusted
          // G1 = g1·√(n(n−1))/(n−2) — convert to the sample definition.
          round(skewness($"value") *
            sqrt(count(lit(1)) * (count(lit(1)) - 1)) / (count(lit(1)) - 2), 5)
            .as("skew"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
        ROUND(CORR(value, (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6) AS corr_vs_time,
        ROUND(COVAR_SAMP(value, (epoch_us(ts) - 1704067200000000) / 86400000000.0), 4) AS covar,
        ROUND(STDDEV_SAMP(value), 4) AS sd,
        ROUND(VAR_SAMP(value), 3) AS variance,
        ROUND(SKEWNESS(value), 5) AS skew
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Left-semi / left-anti joins (EXISTS / NOT EXISTS): per nation, how
    * many customers have an urgent order vs no orders at all.
    */
  private val q33 = GQuery(
    (s, d) => {
      import s.implicits._
      val cust = T.customer(s, d)
      val urgent = T.orders(s, d).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      val withUrgent = cust.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_with_urgent"))
      val noOrders = cust.join(T.orders(s, d).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_no_orders"))
      cust.groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
        .join(withUrgent, Seq("c_nationkey"), "left")
        .join(noOrders, Seq("c_nationkey"), "left")
        .select($"c_nationkey".cast("int").as("nationkey"), $"n_customers",
          coalesce($"n_with_urgent", lit(0L)).as("n_with_urgent"),
          coalesce($"n_no_orders", lit(0L)).as("n_no_orders"))
        .orderBy($"nationkey")
    },
    Some("""SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
        COUNT(*) AS n_customers,
        CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_with_urgent,
        CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_no_orders
      FROM customer GROUP BY c_nationkey ORDER BY nationkey"""))

  /** Grouped OLS forecast with widening CI (M9, mrp_website.py:672-685)
    * over the per-user event series — 12 projected months per user.
    */
  private val q34 = GQuery(
    (s, d) => {
      import s.implicits._
      val series = T.events(s, d)
        .select($"user_id", to_date($"ts").as("date"), $"value")
      Forecast.monthlyForecast(series, "user_id", "date", "value", 12)
        .select($"user_id", $"k".cast("long").as("k"),
          date_format($"future_month", "yyyy-MM-dd").as("future_month"),
          round($"y_future", 4).as("y_future"),
          round($"upper", 4).as("upper"),
          round($"lower", 4).as("lower"))
        .orderBy($"user_id", $"k")
    },
    Some("""WITH base AS (
        SELECT user_id,
          (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 719163)::DOUBLE AS x,
          value::DOUBLE AS y, CAST(ts AS DATE) AS dt
        FROM events WHERE value IS NOT NULL),
      fit AS (
        SELECT user_id, COUNT(*) AS n,
          REGR_SLOPE(y, x) AS m, REGR_INTERCEPT(y, x) AS b,
          AVG(y) AS y_mean, AVG(x) AS x_mean,
          AVG(y*y) AS yy, AVG(x*x) AS xx, AVG(x*y) AS xy,
          AVG(ABS(y)) AS abs_mean, MAX(dt) AS last_date
        FROM base GROUP BY user_id HAVING COUNT(*) >= 3),
      fit2 AS (
        SELECT *, (yy - y_mean*y_mean - m*m*(xx - x_mean*x_mean)) AS resid_var
        FROM fit),
      fit3 AS (
        SELECT *, GREATEST(1e-6, SQRT(GREATEST(resid_var, 0.0))) AS sigma,
          GREATEST(1.0, abs_mean) AS baseline
        FROM fit2),
      proj AS (
        SELECT f.*, k.k,
          date_trunc('month', f.last_date + (k.k * INTERVAL 1 MONTH)) AS future_month
        FROM fit3 f CROSS JOIN (SELECT UNNEST(generate_series(1, 12)) AS k) k),
      calc AS (
        SELECT user_id, k, future_month,
          (date_diff('day', DATE '1970-01-01', CAST(future_month AS DATE)) + 719163)::DOUBLE AS xf,
          m, b, sigma, baseline
        FROM proj)
      SELECT user_id, k, STRFTIME(future_month, '%Y-%m-%d') AS future_month,
        ROUND(m * xf + b, 4) AS y_future,
        ROUND((m * xf + b) + (sigma + (k / 12.0) * (0.15 * baseline)), 4) AS upper,
        ROUND((m * xf + b) - (sigma + (k / 12.0) * (0.15 * baseline)), 4) AS lower
      FROM calc ORDER BY user_id, k"""))

  /** Approximate distinct (HLL-family sketches). The sketch values differ
    * across engines by design, so the oracle-able output is the exact count
    * plus a boolean asserting each engine's own sketch lands within 5% of
    * exact — verifying sketch accuracy, not sketch bits.
    */
  private val q35 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_exact_users"),
          countDistinct(get_json_object($"props", "$.k")).as("n_exact_k"),
          approx_count_distinct($"user_id").as("approx_users"),
          approx_count_distinct(get_json_object($"props", "$.k")).as("approx_k"))
        .select($"event_type", $"n_exact_users", $"n_exact_k",
          (abs($"approx_users" - $"n_exact_users").cast("double") /
            $"n_exact_users" <= 0.05).as("approx_users_ok"),
          (abs($"approx_k" - $"n_exact_k").cast("double") /
            $"n_exact_k" <= 0.05).as("approx_k_ok"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
        COUNT(DISTINCT user_id) AS n_exact_users,
        COUNT(DISTINCT json_extract_string(props, '$.k')) AS n_exact_k,
        (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))::DOUBLE
          / COUNT(DISTINCT user_id) <= 0.05) AS approx_users_ok,
        (ABS(approx_count_distinct(json_extract_string(props, '$.k')) - COUNT(DISTINCT json_extract_string(props, '$.k')))::DOUBLE
          / COUNT(DISTINCT json_extract_string(props, '$.k')) <= 0.05) AS approx_k_ok
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** RANGE-frame window: per-user rolling 24-hour event-value sum keyed on
    * event time (rowsBetween frames are covered by q13/q14; this is the
    * value-range frame).
    */
  private val q36 = GQuery(
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-86400000000L, 0L)
      T.events(s, d)
        .withColumn("rolling_24h",
          sum($"value".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"rolling_24h")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS rolling_24h
      FROM events ORDER BY event_id"""))

  /** Two-stage salted aggregation (Skew.saltedSum) on the HOT lineitem
    * keys — l_returnflag has 3 values over the whole table, the shape
    * where a single reducer key melts at 100 TB. The salt spreads each
    * key over 32 partial aggregates; the oracle is a plain GROUP BY, so a
    * hash-match proves the two-stage plan loses nothing. DECIMAL-cast
    * sums make the double total independent of partial-aggregation order
    * (the oracle-parity rule for money/quantity sums).
    */
  private val q43 = GQuery(
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity".cast("decimal(18,2)").as("qty"))
      graft.scale.Skew.saltedSum(li, "l_returnflag", "qty", saltBuckets = 32)
        .select($"l_returnflag", $"sum_qty".cast("double").as("sum_qty"), $"n")
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Batch twin of the streaming first-wins dedup
    * (Streaming.dedupBatchTwin, the q13 pattern): exactly one event per
    * (user_id, event_type) — earliest by event time, lowest event_id on
    * ties. Passthrough columns need no rounding (no arithmetic touches
    * them on either engine).
    */
  private val q44 = GQuery(
    (s, d) => {
      import s.implicits._
      graft.streaming.Streaming.dedupBatchTwin(T.events(s, d), "ts",
        Seq("user_id", "event_type"), "event_id")
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"), $"value")
        .orderBy($"user_id", $"event_type")
    },
    Some("""WITH ranked AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS rn
        FROM events)
      SELECT event_id, user_id, event_type, ts_us, value
      FROM ranked WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** Bucketed co-located join (scale.Bucketing): both sides written as
    * bucketed tables on the join key (the one-time shuffle), then joined
    * — sort-merge over bucketed scans, ZERO runtime exchange (plan shape
    * asserted in LayoutSpec) — and aggregated by market segment. The
    * oracle is the plain DuckDB join over the raw parquet: the layout
    * must not change the answer. The timed cost honestly includes both
    * bucketed writes — the point of the pattern is that the write is paid
    * once while the join recurs.
    */
  private val q54 = GQuery(
    (s, d) => {
      import s.implicits._
      val dir = Scratch.fresh("graft_bkt_")
      graft.scale.Bucketing.writeBucketed(
        T.customer(s, d).select($"c_custkey", $"c_mktsegment"),
        "graft_bkt_customer", s"$dir/customer", "c_custkey", 8)
      graft.scale.Bucketing.writeBucketed(
        T.orders(s, d).select($"o_custkey", $"o_totalprice"),
        "graft_bkt_orders", s"$dir/orders", "o_custkey", 8)
      graft.scale.Bucketing.colocatedJoin(s,
          "graft_bkt_customer", "graft_bkt_orders", "c_custkey", "o_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Partitioned parquet sink round trip (S2): write lineitem partitioned
    * by l_returnflag (the reference's Glue partitionBy sink shape), read
    * it back with a partition filter, aggregate. The oracle runs the same
    * aggregate on the RAW table, so a hash-match certifies the sink wrote
    * losslessly AND the partition-encoded column round-trips; PlanSpec
    * separately asserts the read side prunes to the one matching
    * partition directory.
    */
  private val q55 = GQuery(
    (s, d) => {
      import s.implicits._
      val dir = Scratch.fresh("graft_sink_")
      T.lineitem(s, d)
        .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
      s.read.parquet(dir)
        .filter($"l_returnflag" === "R")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Bin-bucketed range join (operators.RangeJoin): every 97th event
    * anchors a 30-minute window; count all events falling in each window.
    * The Spark side is the bin-equi join (shuffled, linear — NO
    * BroadcastNestedLoopJoin, asserted in RangeJoinSpec); the oracle is
    * DuckDB's native `BETWEEN` range join, so a hash-match certifies the
    * binning produces exactly the containment pairs.
    */
  private val q56 = GQuery(
    (s, d) => {
      import s.implicits._
      val halfHourUs = 30L * 60 * 1000000
      val ev = T.events(s, d)
        .select($"event_id", unix_micros($"ts").as("ts_us"))
      val intervals = ev.filter($"event_id" % 97 === 0)
        .select($"event_id".as("window_id"), $"ts_us".as("lo_us"),
          ($"ts_us" + halfHourUs).as("hi_us"))
      graft.operators.RangeJoin.pointInInterval(ev, "ts_us",
          intervals, "lo_us", "hi_us", binWidth = halfHourUs)
        .groupBy($"window_id")
        .agg(count(lit(1)).as("n_events"), min($"event_id").as("first_event"))
        .orderBy($"window_id")
    },
    Some("""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
      iv AS (SELECT event_id AS window_id, ts_us AS lo_us,
               ts_us + 1800000000 AS hi_us
             FROM ev WHERE event_id % 97 = 0)
      SELECT window_id, COUNT(*) AS n_events, MIN(e.event_id) AS first_event
      FROM iv JOIN ev e ON e.ts_us >= iv.lo_us AND e.ts_us <= iv.hi_us
      GROUP BY window_id ORDER BY window_id"""))

  /** KMV distinct sketch (functions.KMinValues) over the portable hash —
    * a SKETCH with a full value oracle, not just an error bound: the
    * estimate is a deterministic function of the k smallest hash values,
    * and the DuckDB mirror recomputes the same hashes, k-th minimum, and
    * closed-form estimate. exact_users pins the true cardinality next to
    * the estimate; identical double arithmetic order on both engines
    * ((k−1)·domain then ÷ h_k) keeps the match bit-exact.
    */
  private val q57 = GQuery(
    (s, d) => {
      import s.implicits._
      T.events(s, d)
        .select($"event_type",
          graft.scale.Sampling.portableBucket($"user_id").as("hv"),
          $"user_id")
        .groupBy($"event_type")
        .agg(graft.functions.NativeExpressions
            .kmv_distinct($"hv", k = 128).as("kmv_users"),
          countDistinct($"user_id").cast("double").as("exact_users"))
        .orderBy($"event_type")
    },
    Some {
      val P = 2147483647L
      val bucket = s"(1103515245 * (((user_id % $P) + $P) % $P) + 12345) % $P"
      s"""WITH h AS (
        SELECT DISTINCT event_type, $bucket AS hv, user_id FROM events),
      hd AS (SELECT DISTINCT event_type, hv FROM h),
      r AS (SELECT event_type, hv,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM hd),
      g AS (SELECT event_type, MAX(nd) AS nd,
          MAX(CASE WHEN rn = 128 THEN hv END) AS hk
        FROM r GROUP BY event_type),
      ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS exact_users
        FROM events GROUP BY event_type)
      SELECT g.event_type,
        CASE WHEN g.nd < 128 THEN CAST(g.nd AS DOUBLE)
             ELSE (127.0 * 2147483647.0) / CAST(g.hk AS DOUBLE) END AS kmv_users,
        ex.exact_users
      FROM g JOIN ex ON g.event_type = ex.event_type
      ORDER BY g.event_type"""
    })

  /** Column profiling (scale.Profiling) in EXACT mode so DuckDB can
    * mirror every number: per-column row/non-null/distinct counts and
    * stringified min/max over five lineitem columns spanning long,
    * double, string, and timestamp types. Exact mode is one column-
    * pruned aggregation branch per column unioned (two-level distinct
    * agg, no Expand); the default approx mode (ONE single-pass HLL
    * aggregation, the scale path) is covered numerically in
    * ProfilingSpec. This oracle proves the unpivoted stats themselves —
    * including cross-engine min/max string rendering — are right.
    */
  private val q70 = GQuery(
    (s, d) => graft.scale.Profiling.profile(
      T.lineitem(s, d),
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_shipdate"),
      exact = true),
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
          COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS n_distinct,
          CAST(MIN($c) AS VARCHAR) AS min_value,
          CAST(MAX($c) AS VARCHAR) AS max_value FROM lineitem"""
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_shipdate").map(one).mkString(" UNION ALL ") +
        " ORDER BY col_name"
    })

  def all: Map[String, GQuery] = Map(
    "q29_asof_join" -> q29,
    "q30_rollup" -> q30,
    "q31_percentiles" -> q31,
    "q32_corr_stats" -> q32,
    "q33_semi_anti_join" -> q33,
    "q34_forecast" -> q34,
    "q35_approx_distinct" -> q35,
    "q36_range_frame_window" -> q36,
    "q43_salted_agg" -> q43,
    "q44_stream_dedup_twin" -> q44,
    "q54_bucketed_join" -> q54,
    "q55_sink_roundtrip" -> q55,
    "q56_range_join" -> q56,
    "q57_kmv_distinct" -> q57,
    "q70_column_profile" -> q70,
  )
}
