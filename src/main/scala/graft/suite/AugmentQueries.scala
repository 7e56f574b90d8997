package graft.suite

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}

/** Round-10 analytics breadth: degree-oriented triangle counting (q151),
  * synchronous label propagation (q152), integer-exact CUSUM changepoint
  * detection (q153) and rolling z-score anomalies (q154) — the graph- and
  * monitoring-analytics families a production corpus pipeline runs beside
  * dedup/retrieval.
  */
object AugmentQueries {

  /** Sparsified synthetic graph: node = key mod `m`, edge kept when the
    * raw key sum hits the `keep` residue — ~n/keep raw edges over m
    * nodes, so degrees stay realistic instead of the mod-square going
    * complete.
    */
  private def edgeSql(m: Int, keep: Int): String =
    s"""SELECT l_orderkey % $m AS s, l_partkey % $m AS t
        FROM lineitem WHERE (l_orderkey + l_partkey) % $keep = 0"""

  private def edgesDf(s: org.apache.spark.sql.SparkSession, d: String,
      m: Int, keep: Int) =
    T.lineitem(s, d)
      .where((col("l_orderkey") + col("l_partkey")) % keep === 0)
      .select((col("l_orderkey") % m).as("s"), (col("l_partkey") % m).as("t"))

  /** Triangle counting + local clustering coefficient
    * ([[graft.scale.Graph.triangleStats]]): canonical undirected edges,
    * degree-ORIENTED wedge generation (each node fans out O(√m) oriented
    * neighbors regardless of its true degree — the hub-skew bound), one
    * closing equi-join. The oracle enumerates each triangle once as
    * x < y < z over the same canonical edge set, so a hash-match
    * certifies the oriented plan finds exactly the ordered-triple
    * triangle set. lcc = 2T/(d(d−1)) is one exact-IEEE integer division
    * — no rounding needed on either engine.
    */
  private val q151 = GQuery(
    (s, d) => graft.scale.Graph
      .triangleStats(edgesDf(s, d, 500, 7), "s", "t")
      .orderBy(col("id")),
    Some(s"""WITH raw AS (${edgeSql(500, 7)}),
      e AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
            FROM raw WHERE s <> t),
      deg AS (SELECT id, COUNT(*)::BIGINT AS degree FROM
              (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
              GROUP BY id),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e2.a = e1.b
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (SELECT id, COUNT(*)::BIGINT AS triangles FROM
             (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri) GROUP BY id)
      SELECT deg.id, deg.degree,
        COALESCE(pn.triangles, 0)::BIGINT AS triangles,
        CASE WHEN deg.degree >= 2
          THEN CAST(2 * COALESCE(pn.triangles, 0) AS DOUBLE) /
               CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
          ELSE 0.0::DOUBLE END AS lcc
      FROM deg LEFT JOIN pn ON deg.id = pn.id
      ORDER BY deg.id"""))

  /** One synchronous-LPA round in DuckDB: neighbor-label counts over the
    * symmetric edge list, arg-max by (count DESC, label ASC).
    */
  private def lpaRound(prev: String, next: String): String =
    s"""c_$next AS (SELECT d.n, $prev.lbl, COUNT(*)::BIGINT AS c
          FROM d JOIN $prev ON d.m = $prev.id GROUP BY d.n, $prev.lbl),
      p_$next AS (SELECT n AS id, lbl, ROW_NUMBER() OVER
          (PARTITION BY n ORDER BY c DESC, lbl ASC) AS rn FROM c_$next),
      $next AS (SELECT nodes.id, COALESCE(w.lbl, nodes.id) AS lbl
          FROM nodes LEFT JOIN
          (SELECT id, lbl FROM p_$next WHERE rn = 1) w
          ON nodes.id = w.id)"""

  /** Synchronous label propagation, 3 rounds
    * ([[graft.scale.Graph.labelPropagation]]): seed = own id, adopt the
    * most frequent neighbor label, ties to the SMALLEST label — the
    * total, engine-portable rule (async/hash-order LPA is famously
    * unreproducible; this variant is a pure dataflow fixed number of
    * keyed aggregates). The oracle unrolls all 3 rounds; community sizes
    * ride the final frame.
    */
  private val q152 = GQuery(
    (s, d) => graft.scale.Graph
      .labelPropagation(edgesDf(s, d, 300, 11), "s", "t", iters = 3)
      .orderBy(col("id")),
    Some(s"""WITH raw AS (${edgeSql(300, 11)}),
      e AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
            FROM raw WHERE s <> t),
      d AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
      nodes AS (SELECT DISTINCT n AS id FROM d),
      l0 AS (SELECT id, id AS lbl FROM nodes),
      ${lpaRound("l0", "l1")},
      ${lpaRound("l1", "l2")},
      ${lpaRound("l2", "l3")},
      sizes AS (SELECT lbl, COUNT(*)::BIGINT AS csize FROM l3 GROUP BY lbl)
      SELECT l3.id, l3.lbl AS label, sizes.csize
      FROM l3 JOIN sizes ON l3.lbl = sizes.lbl
      ORDER BY l3.id"""))

  /** CUSUM changepoint monitor over the event stream
    * ([[graft.scale.TimeSeries.cusumChangepoints]]): target 60.00,
    * slack 5.00, alarm threshold 200.00, all in integer 1/100 units —
    * the statistic's prefix sums and running mins are pure int64, so
    * both engines produce bit-identical alarms (a double cumsum would be
    * association-order-dependent). Two window passes share one
    * exchange + sort.
    */
  private val q153 = GQuery(
    (s, d) => graft.scale.TimeSeries
      .cusumChangepoints(T.events(s, d), "user_id",
        Seq("ts", "event_id"), "value",
        targetUnits = 6000L, slackUnits = 500L, thresholdUnits = 20000L)
      .select(col("user_id"), col("event_id"), col("units"),
        col("s_units"), col("alarm"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""WITH u AS (SELECT user_id, event_id, ts,
          CAST(floor(value * 100.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS units
        FROM events),
      p AS (SELECT user_id, event_id, ts, units,
          CAST(SUM(units - 6500) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp
        FROM u),
      s AS (SELECT user_id, event_id, units,
          pp - LEAST(0, CAST(MIN(pp) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
            AS s_units
        FROM p)
      SELECT user_id, event_id, units, s_units, s_units > 20000 AS alarm
      FROM s ORDER BY user_id, event_id"""))

  /** Rolling z-score anomaly flags
    * ([[graft.scale.TimeSeries.rollingZscoreAnomalies]]): each value
    * tested against the trailing-8 window (current row EXCLUDED) at
    * z = 3, with the whole test cross-multiplied into int64 —
    * (n·x−S)²(n−1) > z²·n·(nQ−S²) — so there is no division, sqrt, or
    * float anywhere and both inequality sides are emitted for audit.
    * Only full windows are scored.
    */
  private val q154 = GQuery(
    (s, d) => graft.scale.TimeSeries
      .rollingZscoreAnomalies(T.events(s, d), "user_id",
        Seq("ts", "event_id"), "value", window = 8, z = 3)
      .select(col("user_id"), col("event_id"), col("units"),
        col("lhs"), col("rhs"), col("anomaly"))
      .orderBy(col("user_id"), col("event_id")),
    Some("""WITH u AS (SELECT user_id, event_id, ts,
          CAST(floor(value * 100.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS units
        FROM events),
      w AS (SELECT user_id, event_id, units,
          COUNT(units) OVER fr AS n,
          CAST(SUM(units) OVER fr AS BIGINT) AS s,
          CAST(SUM(units * units) OVER fr AS BIGINT) AS q
        FROM u WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id, units,
        (8 * units - s) * (8 * units - s) * 7 AS lhs,
        9 * 8 * (8 * q - s * s) AS rhs,
        (8 * units - s) * (8 * units - s) * 7 > 9 * 8 * (8 * q - s * s)
          AS anomaly
      FROM w WHERE n = 8 ORDER BY user_id, event_id"""))

  val all: Map[String, GQuery] = Map(
    "q151_triangle_count" -> q151,
    "q152_label_propagation" -> q152,
    "q153_cusum_changepoints" -> q153,
    "q154_rolling_zscore" -> q154)
}
