package graft.suite

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.scale.Sketches

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

  /** CMS probe terms: four corpus words spanning frequency tiers plus
    * one absent ('zzzz') — whose estimate demonstrates the collision
    * overcount the sketch bounds but never hides (estimate ≥ truth).
    */
  private val CmsProbes = Seq("table", "query", "spark", "value", "zzzz")

  /** DuckDB slot expression for CMS row r: mirrors
    * [[graft.scale.Sketches.cmsSlot]] term for term.
    */
  private def cmsSlotSql(h: String, r: Int): String = {
    val (a, b) = graft.scale.Sketches.CmsSalts(r)
    s"(($h % 2147483647) * $a + $b) % 2147483647 % 64 + ${r * 64}"
  }

  /** Count-min frequency sketch lifecycle
    * ([[graft.scale.Sketches.cmsSketch]]/cmsMerge/cmsEstimateCol): two
    * parity batches sketched independently, merged by element-wise SUM
    * (exact — counts are additive, so merge ≡ build-from-union, which is
    * precisely what the one-pass oracle certifies), then point-queried
    * for five probe terms next to their exact counts. The 256-counter
    * table is the frequency sibling of q144's HLL registers: ~2 KB per
    * group forever, merge-fold per batch, never rescan. Streaming twin:
    * [[graft.streaming.Streaming.maintainCmsSketches]].
    */
  private val q155 = GQuery(
    (s, d) => {
      val docs = T.documents(s, d)
      def hashRows(part: org.apache.spark.sql.DataFrame) =
        part.select(col("source"),
          explode(graft.scale.Dedup.portableTokenHashes(
            graft.scale.TextOps.tokens(col("text")))).as("h"))
      val skA = graft.scale.Sketches
        .cmsSketch(hashRows(docs.where(col("doc_id") % 2 === 0)), "source", "h")
      val skB = graft.scale.Sketches
        .cmsSketch(hashRows(docs.where(col("doc_id") % 2 === 1)), "source", "h")
      val merged = graft.scale.Sketches.cmsMerge(skA, skB, "source")
      val probes = s.range(1)
        .select(explode(typedLit(CmsProbes)).as("term"))
        .select(col("term"), element_at(
          graft.scale.Dedup.portableTokenHashes(array(col("term"))), 1)
          .as("__th"))
      val est = merged.crossJoin(broadcast(probes))
        .select(col("source"), col("term"),
          graft.scale.Sketches.cmsEstimateCol(col("counters"), col("__th"))
            .as("cms_estimate"),
          graft.scale.Sketches.cmsFingerprint(col("counters")).as("reg_fp"))
      val exact = docs
        .select(col("source"),
          explode(graft.scale.TextOps.tokens(col("text"))).as("w"))
        .where(col("w").isin(CmsProbes: _*))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("__n"))
      est.join(exact,
          est("source") === exact("source") && est("term") === exact("w"),
          "left")
        .select(est("source"), col("term"),
          coalesce(col("__n"), lit(0L)).as("n_exact"),
          col("cms_estimate"), col("reg_fp"))
        .orderBy(col("source"), col("term"))
    },
    Some(s"""WITH toks AS (
        SELECT source, unnest(list_filter(string_split_regex(text, '\\s+'),
          x -> len(x) > 0)) AS w
        FROM documents),
      h AS (SELECT source, ${ScaleQueries.h62Sql("w")} AS h FROM toks),
      slots AS (
        ${(0 until graft.scale.Sketches.CmsDepth).map(r =>
          s"SELECT source, ${cmsSlotSql("h", r)} AS slot FROM h")
          .mkString("\n        UNION ALL ")}),
      cnt AS (SELECT source, slot, COUNT(*)::BIGINT AS c
        FROM slots GROUP BY source, slot),
      grid AS (SELECT s.source, gs.slot
        FROM (SELECT DISTINCT source FROM toks) s
        CROSS JOIN (SELECT unnest(range(0, 256)) AS slot) gs),
      regs AS (SELECT grid.source, grid.slot, COALESCE(cnt.c, 0) AS c
        FROM grid LEFT JOIN cnt
        ON grid.source = cnt.source AND grid.slot = cnt.slot),
      vec AS (SELECT source, list(c ORDER BY slot) AS rv
        FROM regs GROUP BY source),
      probes AS (SELECT unnest(${CmsProbes.map(t => s"'$t'")
        .mkString("[", ",", "]")}) AS term),
      ph AS (SELECT term, ${ScaleQueries.h62Sql("term")} AS h FROM probes),
      est AS (SELECT v.source, p.term,
          LEAST(${(0 until graft.scale.Sketches.CmsDepth).map(r =>
            s"rv[${cmsSlotSql("p.h", r)} + 1]").mkString(",\n            ")})
            AS cms_estimate,
          CAST(list_sum(list_transform(list_zip(rv, range(1, 257)),
            z -> z[1] * z[2])) AS BIGINT) AS reg_fp
        FROM vec v CROSS JOIN ph p),
      ex AS (SELECT source, w AS term, COUNT(*)::BIGINT AS n_exact
        FROM toks WHERE w IN (${CmsProbes.map(t => s"'$t'").mkString(",")})
        GROUP BY source, w)
      SELECT est.source, est.term,
        COALESCE(ex.n_exact, 0)::BIGINT AS n_exact,
        est.cms_estimate, est.reg_fp
      FROM est LEFT JOIN ex
      ON est.source = ex.source AND est.term = ex.term
      ORDER BY est.source, est.term"""))

  /** Phrase set: a bigram and two trigrams, all present in the corpus
    * (up to 8 occurrences / 5+ docs each at sf0.01) so every phrase
    * exercises multi-occurrence counting, not just existence.
    */
  private val Phrases = Seq("hash value", "slow hash batch", "row column sort")

  private def phraseCte(idx: Int, phrase: String): String = {
    val terms = phrase.split(" ").toSeq
    val joins = terms.zipWithIndex.drop(1).map { case (t, j) =>
      s"JOIN post p$j ON p$j.doc_id = p0.doc_id AND p$j.p = p0.p + $j AND p$j.w = '$t'"
    }.mkString("\n        ")
    s"""m$idx AS (SELECT '$phrase' AS phrase, p0.doc_id,
        COUNT(*)::BIGINT AS n_occur
        FROM post p0
        $joins
        WHERE p0.w = '${terms.head}'
        GROUP BY p0.doc_id)"""
  }

  /** Exact positional phrase search
    * ([[graft.scale.Retrieval.phraseSearch]]): the `"exact quote"`
    * operator — consecutive-position term chains over positional
    * postings that are vocabulary-filtered while still inside the
    * per-doc token array, so only phrase-term positions ever shuffle.
    * The oracle rebuilds the positional index with DuckDB's zipped
    * unnest and chains the same adjacency joins; counts (not just
    * existence) must match per (phrase, doc).
    */
  private val q156 = GQuery(
    (s, d) => graft.scale.Retrieval
      .phraseSearch(T.documents(s, d), "doc_id", "text", Phrases)
      .orderBy(col("phrase"), col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS ws
        FROM documents),
      post AS (SELECT doc_id, unnest(ws) AS w,
          unnest(range(0, len(ws))) AS p
        FROM tk),
      ${Phrases.zipWithIndex.map { case (p, i) => phraseCte(i, p) }
        .mkString(",\n      ")}
      SELECT * FROM (${Phrases.indices.map(i => s"SELECT * FROM m$i")
        .mkString(" UNION ALL ")})
      ORDER BY phrase, doc_id"""))

  /** Text canonicalization ([[graft.scale.Curation.normalizeDocuments]]):
    * the corpus ships pre-cleaned (lowercase, single-spaced), so the query
    * first deterministically DIRTIES each doc on both engines — leading
    * tab/space padding, an uppercased 24-char prefix echo, CRLF, trailing
    * runs — then certifies the single-pass native kernel against DuckDB's
    * trim(regexp_replace(lower(t), '[\x00-\x20]+', ' ', 'g')) replay,
    * including the idempotence bit (normalize∘normalize = normalize).
    */
  private val q157 = GQuery(
    (s, d) => graft.scale.Curation.normalizeDocuments(
      T.documents(s, d).select(col("doc_id"),
        concat(lit(" \t"), upper(substring(col("text"), 1, 24)),
          lit("\r\n"), col("text"), lit("  \n ")).as("text")),
      "doc_id", "text").orderBy(col("id")),
    Some("""WITH dirty AS (SELECT doc_id,
          ' ' || chr(9) || upper(substr(text, 1, 24)) || chr(13) || chr(10)
            || text || '  ' || chr(10) || ' ' AS dt
        FROM documents),
      n AS (SELECT doc_id AS id, length(dt)::BIGINT AS n_raw,
          trim(regexp_replace(lower(dt), '[\x00-\x20]+', ' ', 'g'))
            AS text_norm
        FROM dirty)
      SELECT id, n_raw, length(text_norm)::BIGINT AS n_norm, text_norm,
        (trim(regexp_replace(lower(text_norm), '[\x00-\x20]+', ' ', 'g'))
          = text_norm) AS norm_stable
      FROM n ORDER BY id"""))

  /** Quality-aware near-dup survivorship
    * ([[graft.scale.Dedup.nearDupSurvivorship]]): q41's certified
    * clusters, then ONE max-of-struct aggregate picks the (most tokens,
    * smallest id) survivor per component — no per-component window sort.
    * The oracle resolves exact components with the shared recursive CTE
    * and ranks with a window, so a hash-match certifies cluster recall
    * AND the survivor rule on every doc.
    */
  private val q158 = GQuery(
    (s, d) => graft.scale.Dedup
      .nearDupSurvivorship(T.documents(s, d), "doc_id", "text",
        shingleSize = 3, numPerm = 64, bands = 16, threshold = 0.8)
      .orderBy(col("id")),
    Some(s"""${ScaleQueries.clustersCteSql},
      comp AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
      tc AS (SELECT doc_id AS id,
          len(list_filter(string_split_regex(text, '\\s+'),
            x -> len(x) > 0))::BIGINT AS n_tokens
        FROM documents),
      j AS (SELECT comp.id, comp.component, tc.n_tokens
        FROM comp JOIN tc USING (id)),
      r AS (SELECT id, component, n_tokens,
          COUNT(*) OVER (PARTITION BY component)::BIGINT AS csize,
          ROW_NUMBER() OVER (PARTITION BY component
            ORDER BY n_tokens DESC, id ASC) AS rn
        FROM j)
      SELECT id, component, n_tokens, csize, (rn = 1) AS is_survivor
      FROM r ORDER BY id"""))

  /** Histogram-sketch layout for q159: events.value ∈ [0.01, ~490]
    * quantized ×100, 96 interior 500-unit cells over [0, 48000) plus
    * under/overflow.
    */
  private val HLo = 0L
  private val HHi = 48000L
  private val HBins = 96

  private def histRankSql(num: Int, den: Int): String =
    s"MIN(CASE WHEN cum >= (n * $num + ${den - 1}) // $den THEN bound END)"

  /** Mergeable histogram quantile sketch
    * ([[graft.scale.Sketches.histSketch]]/`histMerge`/`histQuantileCol`):
    * the distribution member of the sketch family — parity batches
    * sketched independently, merged by element-wise sum, then p50/p90/p99
    * answered by an integer rank walk. The oracle rebuilds the counters
    * from the whole stream in one pass and replays the same rank
    * arithmetic, so a hash-match certifies merge ≡ whole-build AND every
    * estimate, plus the counter checksum.
    */
  private val q159 = GQuery(
    (s, d) => {
      val ev = T.events(s, d).select(col("event_type"),
        floor(col("value") * 100d + 0.5d).cast("long").as("u"),
        (col("event_id") % 2 === 0).as("__even"))
      val a = Sketches.histSketch(ev.filter(col("__even")),
        "event_type", "u", HLo, HHi, HBins)
      val b = Sketches.histSketch(ev.filter(!col("__even")),
        "event_type", "u", HLo, HHi, HBins)
      Sketches.histMerge(a, b, "event_type")
        .select(col("event_type"),
          aggregate(col("counters"), lit(0L), (acc, x) => acc + x).as("n"),
          Sketches.histQuantileCol(col("counters"), 1, 2, HLo, HHi, HBins)
            .as("p50_units"),
          Sketches.histQuantileCol(col("counters"), 9, 10, HLo, HHi, HBins)
            .as("p90_units"),
          Sketches.histQuantileCol(col("counters"), 99, 100, HLo, HHi, HBins)
            .as("p99_units"),
          Sketches.counterFingerprint(col("counters")).as("hist_fp"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH u AS (SELECT event_type,
          CAST(floor(value * 100 + 0.5) AS BIGINT) AS u FROM events),
      sl AS (SELECT event_type,
          CASE WHEN u < $HLo THEN 0
               WHEN u >= $HHi THEN ${HBins + 1}
               ELSE (u - $HLo) // ${(HHi - HLo) / HBins} + 1 END AS slot
        FROM u),
      cnt AS (SELECT event_type, slot, COUNT(*)::BIGINT AS c
        FROM sl GROUP BY event_type, slot),
      grid AS (SELECT g.event_type, gs.slot
        FROM (SELECT DISTINCT event_type FROM u) g
        CROSS JOIN (SELECT unnest(range(0, ${HBins + 2})) AS slot) gs),
      regs AS (SELECT grid.event_type, grid.slot, COALESCE(cnt.c, 0) AS c
        FROM grid LEFT JOIN cnt
        ON grid.event_type = cnt.event_type AND grid.slot = cnt.slot),
      cum AS (SELECT event_type, slot, c,
          SUM(c) OVER (PARTITION BY event_type ORDER BY slot)::BIGINT AS cum,
          SUM(c) OVER (PARTITION BY event_type)::BIGINT AS n,
          CASE WHEN slot = 0 THEN $HLo
               WHEN slot = ${HBins + 1} THEN $HHi
               ELSE $HLo + (slot - 1) * ${(HHi - HLo) / HBins} END AS bound
        FROM regs)
      SELECT event_type, MAX(n) AS n,
        ${histRankSql(1, 2)} AS p50_units,
        ${histRankSql(9, 10)} AS p90_units,
        ${histRankSql(99, 100)} AS p99_units,
        CAST(SUM((slot + 1) * c) AS BIGINT) AS hist_fp
      FROM cum GROUP BY event_type ORDER BY event_type"""))

  /** PMI collocation mining ([[graft.scale.TextOps.collocationPmi]]):
    * bigram-marginal pointwise mutual information over one frozen bigram
    * shuffle, top-50 by (pmi desc, pair). The oracle replays counts,
    * marginals, and the exact IEEE expression shape (products → divide →
    * ln → round 6), so the hash-match certifies the ranking cut too.
    */
  private val q160 = GQuery(
    (s, d) => graft.scale.TextOps
      .collocationPmi(T.documents(s, d), "text", minCount = 5L, topN = 50)
      .orderBy(col("pmi").desc, col("w1"), col("w2")),
    Some("""WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
          x -> len(x) > 0) AS t
        FROM documents),
      b2 AS (
        SELECT bigram, string_split(bigram, ' ')[1] AS w1,
          string_split(bigram, ' ')[2] AS w2
        FROM (SELECT unnest(list_transform(range(2, len(t) + 1),
            i -> t[i-1] || ' ' || t[i])) AS bigram
          FROM toks)),
      cb AS (SELECT bigram, w1, w2, COUNT(*)::BIGINT AS n_pair
        FROM b2 GROUP BY bigram, w1, w2),
      ch AS (SELECT w1, COUNT(*)::BIGINT AS n_head FROM b2 GROUP BY w1),
      ct AS (SELECT w2, COUNT(*)::BIGINT AS n_tail FROM b2 GROUP BY w2),
      n AS (SELECT COUNT(*)::BIGINT AS n_total FROM b2)
      SELECT w1, w2, n_pair, n_head, n_tail,
        ROUND(ln((n_pair::DOUBLE * n_total::DOUBLE)
          / (n_head::DOUBLE * n_tail::DOUBLE)), 6) AS pmi
      FROM cb JOIN ch USING (w1) JOIN ct USING (w2) CROSS JOIN n
      WHERE n_pair >= 5
      ORDER BY pmi DESC, w1, w2 LIMIT 50"""))

  /** Duplicate-span REMOVAL ([[graft.scale.Dedup.removeDuplicateSpans]]):
    * q91's ExactSubstr signal applied — duplicated 40-char grams (stride
    * 10) excised as merged maximal spans. The oracle resolves the same
    * dup-gram set (md5 parity with q91), merges islands by the
    * gaps-and-islands window pattern, and reassembles the kept text with
    * an ordered string_agg — so the hash-match certifies the exact
    * character-level excision, not just the counts.
    */
  private val q161 = GQuery(
    (s, d) => graft.scale.Dedup
      .removeDuplicateSpans(T.documents(s, d), "doc_id", "text",
        gramChars = 40, stride = 10)
      .orderBy(col("doc_id")),
    Some("""WITH st AS (
        SELECT doc_id, text,
          unnest(range(1, greatest(len(text) - 40 + 1, 1) + 1, 10)) AS s
        FROM documents),
      gr AS (SELECT doc_id, s, md5(substr(text, s, 40)) AS h FROM st),
      c AS (SELECT h, COUNT(*)::BIGINT AS n FROM gr GROUP BY h),
      dup AS (SELECT doc_id, s FROM gr JOIN c USING (h) WHERE c.n > 1),
      mk AS (SELECT doc_id, s,
          CASE WHEN LAG(s) OVER w IS NULL OR s > LAG(s) OVER w + 40
            THEN 1 ELSE 0 END AS brk
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY s)),
      isl AS (SELECT doc_id,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island, s
        FROM mk),
      ib AS (SELECT doc_id, island, MIN(s) AS ib, MAX(s) + 40 AS ie
        FROM isl GROUP BY doc_id, island),
      seg AS (SELECT doc_id,
          COALESCE(LAG(ie) OVER (PARTITION BY doc_id ORDER BY ib), 1) AS kb,
          ib AS ke FROM ib),
      mid AS (SELECT seg.doc_id,
          string_agg(substr(d.text, kb, ke - kb), '' ORDER BY kb) AS m
        FROM seg JOIN documents d USING (doc_id) GROUP BY seg.doc_id),
      tl AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans, MAX(ie) AS te
        FROM ib GROUP BY doc_id),
      res AS (SELECT d.doc_id,
          COALESCE(tl.n_spans, 0)::BIGINT AS n_spans_removed,
          COALESCE(mid.m, '') ||
            CASE WHEN tl.te IS NULL THEN d.text
                 ELSE substr(d.text, tl.te::INT) END AS text_clean,
          d.text
        FROM documents d LEFT JOIN tl USING (doc_id)
        LEFT JOIN mid ON mid.doc_id = d.doc_id)
      SELECT doc_id, n_spans_removed,
        (len(text) - len(text_clean))::BIGINT AS n_chars_removed, text_clean
      FROM res ORDER BY doc_id"""))

  /** EXACT span removal at full ExactSubstr fidelity
    * (Dedup.removeExactDuplicateSpans — q161's apply step with q218's
    * every-position exact derivation instead of stride sampling): every
    * byte covered by a duplicated substring ≥ 30 chars is excised,
    * islands merged, clean docs pass through 0/0. The oracle replays
    * positions → STRING-grouped counts → islands → the segment-stitch
    * reconstruction, so one hash-match certifies both the exact dup set
    * and the byte-precise cut.
    */
  private val q221 = GQuery(
    (s, d) => graft.scale.Dedup
      .removeExactDuplicateSpans(T.documents(s, d), "doc_id", "text",
        minLen = 30)
      .orderBy(col("doc_id")),
    Some("""WITH st AS (
        SELECT doc_id, text, unnest(range(1, len(text) - 30 + 2)) AS s
        FROM documents WHERE len(text) >= 30),
      gr AS (SELECT doc_id, s, substr(text, s, 30) AS g FROM st),
      c AS (SELECT g, COUNT(*)::BIGINT AS n FROM gr GROUP BY g),
      dup AS (SELECT doc_id, s FROM gr JOIN c USING (g) WHERE c.n > 1),
      mk AS (SELECT doc_id, s,
          CASE WHEN LAG(s) OVER w IS NULL OR s > LAG(s) OVER w + 30
            THEN 1 ELSE 0 END AS brk
        FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY s)),
      isl AS (SELECT doc_id,
          SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS island, s
        FROM mk),
      ib AS (SELECT doc_id, island, MIN(s) AS ib, MAX(s) + 30 AS ie
        FROM isl GROUP BY doc_id, island),
      seg AS (SELECT doc_id,
          COALESCE(LAG(ie) OVER (PARTITION BY doc_id ORDER BY ib), 1) AS kb,
          ib AS ke FROM ib),
      mid AS (SELECT seg.doc_id,
          string_agg(substr(d.text, kb, ke - kb), '' ORDER BY kb) AS m
        FROM seg JOIN documents d USING (doc_id) GROUP BY seg.doc_id),
      tl AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans, MAX(ie) AS te
        FROM ib GROUP BY doc_id),
      res AS (SELECT d.doc_id,
          COALESCE(tl.n_spans, 0)::BIGINT AS n_spans_removed,
          COALESCE(mid.m, '') ||
            CASE WHEN tl.te IS NULL THEN d.text
                 ELSE substr(d.text, tl.te::INT) END AS text_clean,
          d.text
        FROM documents d LEFT JOIN tl USING (doc_id)
        LEFT JOIN mid ON mid.doc_id = d.doc_id)
      SELECT doc_id, n_spans_removed,
        (len(text) - len(text_clean))::BIGINT AS n_chars_removed, text_clean
      FROM res ORDER BY doc_id"""))

  /** Explicit salted fact⋈dim join ([[graft.scale.Skew.saltedJoin]]):
    * lineitem⋈supplier on the supplier key through 8 salt buckets, then
    * per-supplier revenue. The oracle is the PLAIN SQL join — the
    * hash-match certifies salt-routing changes nothing (the whole point
    * of the operator), while PlanSpec pins that the salted (key, salt)
    * join + dim replication actually shape the plan.
    */
  private val q162 = GQuery(
    (s, d) => graft.scale.Skew.saltedJoin(
        T.lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice"),
          col("l_discount")),
        T.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        "l_suppkey", "s_suppkey", saltBuckets = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(28,4)")).cast("double").as("revenue"))
      .orderBy(col("s_name")),
    Some("""SELECT s_name, COUNT(*)::BIGINT AS n_items,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY s_name"""))

  /** Per-source token-distribution entropy
    * ([[graft.scale.TextOps.tokenEntropy]]): Σ c·ln c folded over the
    * Zipf-collapsed count-MULTIPLICITY table (sorted, pinned), never the
    * vocabulary — the oracle replays the same collapse and fold shape.
    */
  private val q163 = GQuery(
    (s, d) => graft.scale.TextOps
      .tokenEntropy(T.documents(s, d), "source", "text")
      .orderBy(col("source")),
    Some("""WITH tc AS (
        SELECT source, t, COUNT(*)::BIGINT AS c
        FROM (SELECT source,
            unnest(list_filter(string_split_regex(text, '\s+'),
              x -> len(x) > 0)) AS t
          FROM documents)
        GROUP BY source, t),
      cm AS (SELECT source, c, COUNT(*)::BIGINT AS m
        FROM tc GROUP BY source, c),
      agg AS (SELECT source,
          CAST(SUM(m * c) AS BIGINT) AS n_tokens,
          CAST(SUM(m) AS BIGINT) AS vocab,
          list_reduce(list_prepend(0.0::DOUBLE,
            list((m * c)::DOUBLE * ln(c::DOUBLE) ORDER BY c)),
            (a, x) -> a + x) AS s
        FROM cm GROUP BY source)
      SELECT source, n_tokens, vocab,
        ROUND(ln(n_tokens::DOUBLE) - s / n_tokens::DOUBLE, 6) AS entropy
      FROM agg ORDER BY source"""))

  /** Token-distribution tail stats
    * ([[graft.scale.TextOps.tokenTailStats]]): hapax counts /
    * Good-Turing unseen-mass share and Simpson repeat-probability over
    * the count-multiplicity collapse — all integer sums and exact
    * rationals, so the oracle replays everything including the ratios.
    */
  private val q164 = GQuery(
    (s, d) => graft.scale.TextOps
      .tokenTailStats(T.documents(s, d), "source", "text")
      .orderBy(col("source")),
    Some("""WITH tc AS (
        SELECT source, t, COUNT(*)::BIGINT AS c
        FROM (SELECT source,
            unnest(list_filter(string_split_regex(text, '\s+'),
              x -> len(x) > 0)) AS t
          FROM documents)
        GROUP BY source, t),
      cm AS (SELECT source, c, COUNT(*)::BIGINT AS m
        FROM tc GROUP BY source, c),
      agg AS (SELECT source,
          CAST(SUM(m * c) AS BIGINT) AS n_tokens,
          CAST(SUM(m) AS BIGINT) AS vocab,
          CAST(SUM(CASE WHEN c = 1 THEN m ELSE 0 END) AS BIGINT) AS n_hapax,
          CAST(SUM(m * c * (c - 1)) AS BIGINT) AS rep
        FROM cm GROUP BY source)
      SELECT source, n_tokens, vocab, n_hapax,
        ROUND(n_hapax::DOUBLE / n_tokens::DOUBLE, 6) AS hapax_share,
        CASE WHEN n_tokens >= 2
          THEN ROUND(rep::DOUBLE / (n_tokens * (n_tokens - 1))::DOUBLE, 6)
          ELSE 0.0::DOUBLE END AS simpson
      FROM agg ORDER BY source"""))

  /** Interval-integrity audit ([[graft.scale.TimeSeries.intervalAudit]]):
    * validity intervals synthesized deterministically from events
    * (start = event micros, length = quantized value in ms), audited per
    * user bucket for overlaps / gaps / coverage — the pre-flight check
    * for any point-in-time join table. All int64; the oracle replays the
    * running-max window and every counter.
    */
  private val q165 = GQuery(
    (s, d) => graft.scale.TimeSeries.intervalAudit(
        T.events(s, d).select((col("user_id") % 50).as("k"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) +
            floor(col("value") * 100d + 0.5d).cast("long") * 1000L)
            .as("e0")),
        "k", "s0", "e0")
      .orderBy(col("key")),
    Some("""WITH iv AS (SELECT user_id % 50 AS k,
          epoch_us(ts) AS s0,
          epoch_us(ts) + CAST(floor(value * 100 + 0.5) AS BIGINT) * 1000
            AS e0
        FROM events),
      mk AS (SELECT k, s0, e0,
          MAX(e0) OVER (PARTITION BY k ORDER BY s0, e0
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        FROM iv),
      agg AS (SELECT k AS key,
          COUNT(*)::BIGINT AS n_intervals,
          CAST(SUM(CASE WHEN pmax IS NOT NULL AND s0 < pmax
            THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
          CAST(SUM(CASE WHEN pmax IS NOT NULL AND s0 > pmax
            THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
          CAST(SUM(CASE WHEN pmax IS NOT NULL AND s0 > pmax
            THEN s0 - pmax ELSE 0 END) AS BIGINT) AS gap_units,
          MAX(GREATEST(e0, COALESCE(pmax, e0))) - MIN(s0) AS span_units
        FROM mk GROUP BY k)
      SELECT key, n_intervals, n_overlaps, n_gaps, gap_units, span_units,
        span_units - gap_units AS covered_units
      FROM agg ORDER BY key"""))

  /** Frequent event-path mining ([[graft.scale.Funnel.frequentPaths]]):
    * top-25 consecutive 3-step event-type paths over (ts, event_id)-
    * ordered per-user streams; the oracle replays the LEAD window and
    * the (n desc, path) cut.
    */
  private val q166 = GQuery(
    (s, d) => graft.scale.Funnel.frequentPaths(
      T.events(s, d), "user_id", "event_type", "ts", "event_id",
      n = 3, topN = 25),
    Some("""WITH st AS (SELECT user_id, event_type,
          LEAD(event_type, 1) OVER w AS e2,
          LEAD(event_type, 2) OVER w AS e3
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM st WHERE e3 IS NOT NULL)
      SELECT path, COUNT(*)::BIGINT AS n FROM p GROUP BY path
      ORDER BY n DESC, path LIMIT 25"""))

  /** Exact-count stratified split
    * ([[graft.scale.Sampling.exactStratifiedSplit]]): per language,
    * exactly ⌊n·0.8⌋ train / ⌊n·0.1⌋ val / remainder test, cut on the
    * deterministic (portable bucket, id) order via the two-job
    * prefix-sum rank (no per-stratum window). The oracle replays the
    * rank with a window (fine at oracle scale) and the same integer cut
    * arithmetic — a hash-match certifies every row's rank AND split.
    */
  private val q167 = GQuery(
    (s, d) => graft.scale.Sampling.exactStratifiedSplit(
        T.documents(s, d), col("doc_id"), col("lang"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .orderBy(col("id")),
    Some(s"""WITH b AS (SELECT doc_id AS id, lang AS stratum,
          ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      r AS (SELECT id, stratum, bk,
          CAST(ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY bk, id) - 1
            AS BIGINT) AS rank,
          COUNT(*) OVER (PARTITION BY stratum) AS n
        FROM b)
      SELECT id, stratum, rank,
        CASE WHEN rank < n * 800 // 1000 THEN 'train'
             WHEN rank < n * 800 // 1000 + n * 100 // 1000 THEN 'val'
             ELSE 'test' END AS split
      FROM r ORDER BY id"""))

  /** Isotonic score calibration ([[graft.scale.Probe.isotonicCalibrate]]):
    * a deterministic synthetic (score, label) pair per doc — two
    * independent sub-streams of the portable bucket, P(label|score) ≈
    * score — binned ×20 and calibrated by the closed minimax formula.
    * The oracle replays bins, prefix sums, the interval-mean grid, and
    * the min/max collapse — certifying every calibrated rate, which an
    * iterative PAVA could never hash-match.
    */
  private val q168 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Probe.isotonicCalibrate(
        T.documents(s, d).select(
          (u1.cast("double") / 1000d).as("score"),
          (u2 < u1).cast("long").as("y")),
        col("score"), col("y"), bins = 20)
        .orderBy(col("bin"))
    },
    Some(s"""WITH b AS (SELECT ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT bk % 1000 AS u1, (bk // 1000) % 1000 AS u2 FROM b),
      rws AS (SELECT
          LEAST(GREATEST(CAST(floor((u1 / 1000.0) * 20) AS BIGINT), 0), 19)
            AS bin,
          CASE WHEN u2 < u1 THEN 1 ELSE 0 END AS y
        FROM sl),
      base AS (SELECT bin, COUNT(*)::BIGINT AS n,
          CAST(SUM(y) AS BIGINT) AS pos
        FROM rws GROUP BY bin),
      pre AS (SELECT bin, n, pos,
          SUM(n) OVER (ORDER BY bin)::BIGINT AS cn,
          SUM(pos) OVER (ORDER BY bin)::BIGINT AS cp
        FROM base),
      jf AS (SELECT bin AS jb, cn - n AS jn0, cp - pos AS jp0 FROM pre),
      kf AS (SELECT bin AS kb, cn AS kn, cp AS kp FROM pre),
      grid AS (SELECT jb, kb,
          (kp - jp0)::DOUBLE / (kn - jn0)::DOUBLE AS avg
        FROM jf JOIN kf ON jb <= kb),
      mn AS (SELECT i.bin AS ib, g.jb, MIN(g.avg) AS mn
        FROM pre i JOIN grid g ON g.jb <= i.bin AND g.kb >= i.bin
        GROUP BY i.bin, g.jb),
      iso AS (SELECT ib, MAX(mn) AS iso FROM mn GROUP BY ib)
      SELECT base.bin, n, pos,
        ROUND(pos::DOUBLE / n::DOUBLE, 6) AS rate_raw,
        ROUND(iso, 6) AS rate_iso
      FROM base JOIN iso ON base.bin = iso.ib ORDER BY bin"""))

  /** Deterministic MLM masking ([[graft.scale.TextOps.mlmMask]]): 15%
    * per-token mask decided by the portable (doc, position) hash; the
    * oracle replays the hash, the [MASK] substitution, and the
    * "pos:token" label stream character-exactly.
    */
  private val q169 = GQuery(
    (s, d) => graft.scale.TextOps
      .mlmMask(T.documents(s, d), "doc_id", "text", maskPermille = 150)
      .orderBy(col("doc_id")),
    Some {
      val cut = 2147483647L * 150L / 1000L
      s"""WITH toks AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)
            AS t
        FROM documents),
      m AS (SELECT doc_id, len(t)::BIGINT AS n,
          list_transform(t, (tok, i) -> struct_pack(
            mask := ${ScaleQueries.bucketSql("(doc_id * 131071 + (i - 1))")}
              < $cut,
            tok := tok, pos := i - 1)) AS mm
        FROM toks)
      SELECT doc_id, n AS n_tokens,
        len(list_filter(mm, e -> e.mask))::BIGINT AS n_masked,
        array_to_string(list_transform(mm,
          e -> CASE WHEN e.mask THEN '[MASK]' ELSE e.tok END), ' ')
          AS text_masked,
        COALESCE(array_to_string(list_transform(list_filter(mm, e -> e.mask),
          e -> e.pos::VARCHAR || ':' || e.tok), ' '), '') AS labels
      FROM m ORDER BY doc_id"""
    })

  /** Per-source corpus health report
    * ([[graft.scale.TextOps.corpusReport]]): the dataset-card
    * composition — volume, vocabulary, entropy, concentration in one
    * frame; the oracle fuses the q163/q164 replay chains.
    */
  private val q170 = GQuery(
    (s, d) => graft.scale.TextOps
      .corpusReport(T.documents(s, d), "source", "text")
      .orderBy(col("source")),
    Some("""WITH tc AS (
        SELECT source, t, COUNT(*)::BIGINT AS c
        FROM (SELECT source,
            unnest(list_filter(string_split_regex(text, '\s+'),
              x -> len(x) > 0)) AS t
          FROM documents)
        GROUP BY source, t),
      cm AS (SELECT source, c, COUNT(*)::BIGINT AS m
        FROM tc GROUP BY source, c),
      agg AS (SELECT source,
          CAST(SUM(m * c) AS BIGINT) AS n_tokens,
          CAST(SUM(m) AS BIGINT) AS vocab,
          CAST(SUM(CASE WHEN c = 1 THEN m ELSE 0 END) AS BIGINT)
            AS n_hapax,
          CAST(SUM(m * c * (c - 1)) AS BIGINT) AS rep,
          list_reduce(list_prepend(0.0::DOUBLE,
            list((m * c)::DOUBLE * ln(c::DOUBLE) ORDER BY c)),
            (a, x) -> a + x) AS s
        FROM cm GROUP BY source),
      vol AS (SELECT source, COUNT(*)::BIGINT AS n_docs
        FROM documents GROUP BY source)
      SELECT vol.source, vol.n_docs, agg.n_tokens,
        ROUND(agg.n_tokens::DOUBLE / vol.n_docs::DOUBLE, 6)
          AS mean_doc_tokens,
        agg.vocab, agg.n_hapax,
        ROUND(agg.n_hapax::DOUBLE / agg.n_tokens::DOUBLE, 6)
          AS hapax_share,
        ROUND(ln(agg.n_tokens::DOUBLE) - agg.s / agg.n_tokens::DOUBLE, 6)
          AS entropy,
        CASE WHEN agg.n_tokens >= 2
          THEN ROUND(agg.rep::DOUBLE /
            (agg.n_tokens * (agg.n_tokens - 1))::DOUBLE, 6)
          ELSE 0.0::DOUBLE END AS simpson
      FROM vol JOIN agg USING (source) ORDER BY vol.source"""))

  val all: Map[String, GQuery] = Map(
    "q151_triangle_count" -> q151,
    "q152_label_propagation" -> q152,
    "q153_cusum_changepoints" -> q153,
    "q154_rolling_zscore" -> q154,
    "q155_count_min_sketch" -> q155,
    "q156_phrase_search" -> q156,
    "q157_text_normalize" -> q157,
    "q158_near_dup_survivorship" -> q158,
    "q159_histogram_quantile_sketch" -> q159,
    "q160_pmi_collocations" -> q160,
    "q161_dup_span_removal" -> q161,
    "q221_exact_span_removal" -> q221,
    "q162_salted_join" -> q162,
    "q163_token_entropy" -> q163,
    "q164_token_tail_stats" -> q164,
    "q165_interval_audit" -> q165,
    "q166_frequent_paths" -> q166,
    "q167_exact_stratified_split" -> q167,
    "q168_isotonic_calibration" -> q168,
    "q169_mlm_masking" -> q169,
    "q170_corpus_report" -> q170)
}
