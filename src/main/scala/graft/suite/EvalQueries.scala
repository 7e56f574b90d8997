package graft.suite

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}

/** Evaluation-metrics family (q171+): the grading leg of a training-data
  * pipeline — once classifiers gate documents (q78 quality, q60 Gopher,
  * q47's reference scorers), something has to measure those gates
  * against labels. Every metric here follows the integer-statistic
  * discipline of [[graft.scale.Eval]]: exact int64 contingency /
  * rank-statistic numerators, ONE final division (or a fixed-order IEEE
  * fold), so the DuckDB oracle certifies the arithmetic bit for bit.
  *
  * Labels/scores are synthesized from the portable bucket (the q168
  * pattern): two independent sub-streams of the same deterministic hash
  * give a score u1/1000 and a label drawn with P(y=1|u1) = u1/1000 —
  * a well-behaved calibrated scorer both engines reconstruct exactly.
  */
object EvalQueries {

  /** Exact tie-aware ROC-AUC per language ([[graft.scale.Eval.binaryAuc]]):
    * Mann-Whitney numerator on the distinct-unit collapse — the plan
    * windows over ≤1000 rows per group no matter the corpus size. The
    * oracle replays the same contingency prefix sums; AUC lands ≈ 2/3
    * (the exact value for P(y|u)=u with uniform u, replayed exactly).
    */
  private val q171 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.binaryAuc(
        T.documents(s, d).select(col("lang"), u1.as("u"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("u"), col("y"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS u,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      per AS (SELECT lang, u, COUNT(*)::BIGINT AS n,
          CAST(SUM(y) AS BIGINT) AS pos
        FROM sl GROUP BY lang, u),
      pre AS (SELECT lang, u, pos, n - pos AS neg,
          COALESCE(SUM(n - pos) OVER (PARTITION BY lang ORDER BY u
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS negbelow
        FROM per),
      agg AS (SELECT lang, CAST(SUM(pos) AS BIGINT) AS n_pos,
          CAST(SUM(neg) AS BIGINT) AS n_neg,
          CAST(SUM(pos * (2 * negbelow + neg)) AS BIGINT) AS numer2
        FROM pre GROUP BY lang)
      SELECT lang, n_pos, n_neg,
        CASE WHEN n_pos > 0 AND n_neg > 0
          THEN ROUND(numer2::DOUBLE / (2.0 * n_pos::DOUBLE * n_neg::DOUBLE), 6)
          ELSE NULL END AS auc
      FROM agg ORDER BY lang"""))

  /** Two-sample KS drift test per language
    * ([[graft.scale.Eval.ksStatistic]]): does the even-doc_id half of
    * each language's length distribution match the odd half? D's
    * numerator max runs over exact int64 cross-multiplied ECDFs (no
    * double steers the max), divided once. The A/B split here is the
    * canary shape — in production the sides are "this week's crawl" vs
    * "last week's".
    */
  private val q172 = GQuery(
    (s, d) => graft.scale.Eval.ksStatistic(
        T.documents(s, d), col("lang"), col("n_chars"),
        pmod(col("doc_id"), lit(2L)) === 0L)
      .withColumnRenamed("group", "lang")
      .orderBy(col("lang")),
    Some("""WITH per AS (SELECT lang, n_chars AS u,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS na_v,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
            AS nb_v
        FROM documents GROUP BY lang, n_chars),
      cum AS (SELECT lang, u, na_v, nb_v,
          SUM(na_v) OVER (PARTITION BY lang ORDER BY u
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ca,
          SUM(nb_v) OVER (PARTITION BY lang ORDER BY u
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cb,
          SUM(na_v) OVER (PARTITION BY lang)::BIGINT AS ta,
          SUM(nb_v) OVER (PARTITION BY lang)::BIGINT AS tb
        FROM per),
      agg AS (SELECT lang, MAX(ta) AS n_a, MAX(tb) AS n_b,
          MAX(ABS(tb * ca - ta * cb)) AS d_num
        FROM cum GROUP BY lang)
      SELECT lang, n_a, n_b, d_num,
        CASE WHEN n_a > 0 AND n_b > 0
          THEN ROUND(d_num::DOUBLE / (n_a * n_b)::DOUBLE, 6)
          ELSE NULL END AS d
      FROM agg ORDER BY lang"""))

  /** Retrieval grading ([[graft.scale.Eval.rankingEval]]): MRR /
    * recall@10 / NDCG@10 of a deterministic run table against graded
    * gold, both synthesized from the lineitem candidate pool by
    * independent portable-hash streams (runs ranked by one hash, gold
    * membership drawn by another — a plausibly-imperfect retriever).
    * DCG/IDCG fold in explicit rank order on both engines, so even the
    * IEEE sums hash-match; queries with no run hits keep a row with
    * zero scores.
    */
  private val q173 = GQuery(
    (s, d) => {
      import graft.scale.Sampling.portableBucket
      val pool = T.lineitem(s, d)
        .select(pmod(col("l_orderkey"), lit(40L)).as("q"),
          pmod(col("l_partkey"), lit(200L)).as("doc"))
        .distinct()
      val runs = pool
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q"))
            .orderBy(portableBucket(col("q") * 1009L + col("doc")),
              col("doc"))))
        .where(col("rank") <= 10)
      val gold = pool
        .where(pmod(portableBucket(col("doc") * 31L + col("q")), lit(5L))
          === 0L)
        .withColumn("grade", lit(1L) + pmod(col("doc"), lit(3L)))
      graft.scale.Eval.rankingEval(runs, gold, "q", "doc", "rank",
          "grade", k = 10)
        .orderBy(col("qid"))
    },
    Some(s"""WITH pool AS (SELECT DISTINCT l_orderkey % 40 AS q,
          l_partkey % 200 AS doc FROM lineitem),
      runs AS (SELECT q, doc, ROW_NUMBER() OVER (PARTITION BY q
          ORDER BY ${ScaleQueries.bucketSql("(q * 1009 + doc)")}, doc)
          AS rank FROM pool),
      r AS (SELECT * FROM runs WHERE rank <= 10),
      gold AS (SELECT q, doc, 1 + doc % 3 AS grade FROM pool
        WHERE ${ScaleQueries.bucketSql("(doc * 31 + q)")} % 5 = 0),
      j AS (SELECT r.q, r.rank, COALESCE(gold.grade, 0) AS rel
        FROM r LEFT JOIN gold ON r.q = gold.q AND r.doc = gold.doc),
      pr AS (SELECT q,
          MIN(CASE WHEN rel > 0 THEN rank END) AS first_hit,
          CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(rel::DOUBLE / log2(rank::DOUBLE + 1) ORDER BY rank)),
            (a, x) -> a + x) AS dcg
        FROM j GROUP BY q),
      tg AS (SELECT q, grade, ROW_NUMBER() OVER (PARTITION BY q
          ORDER BY grade DESC, doc) AS pos FROM gold),
      pg AS (SELECT g1.q, g1.n_gold, g2.idcg FROM
        (SELECT q, COUNT(*)::BIGINT AS n_gold FROM gold GROUP BY q) g1
        JOIN (SELECT q, list_reduce(list_prepend(0.0::DOUBLE,
            list(grade::DOUBLE / log2(pos::DOUBLE + 1) ORDER BY pos)),
            (a, x) -> a + x) AS idcg
          FROM tg WHERE pos <= 10 GROUP BY q) g2 ON g1.q = g2.q)
      SELECT pg.q AS qid, pg.n_gold,
        COALESCE(pr.hits, 0)::BIGINT AS hits,
        ROUND(COALESCE(1.0 / first_hit, 0.0), 6) AS rr,
        ROUND(COALESCE(pr.hits, 0)::DOUBLE / pg.n_gold::DOUBLE, 6)
          AS recall,
        ROUND(COALESCE(pr.dcg, 0.0) / pg.idcg, 6) AS ndcg
      FROM pg LEFT JOIN pr ON pg.q = pr.q ORDER BY qid"""))

  /** Cohen's kappa inter-annotator agreement per language
    * ([[graft.scale.Eval.cohenKappa]]): annotator A bands each doc by
    * length (n_chars/100); annotator B sees the length through a
    * deterministic ±60-char jitter (a portable-bucket sub-stream) —
    * a realistically-noisy second rater. κ's numerator and denominator
    * are pure int64 marginal products; the oracle replays the full
    * contingency algebra.
    */
  private val q174 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val jit = pmod(b, lit(120L)) - 60L
      val v = greatest(col("n_chars") + jit, lit(0L))
      graft.scale.Eval.cohenKappa(
        T.documents(s, d).select(col("lang"),
          floor(col("n_chars") / lit(100d)).cast("long").as("a"),
          floor(v / lit(100d)).cast("long").as("b")),
        col("lang"), col("a"), col("b"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH ann AS (SELECT lang,
          n_chars // 100 AS a,
          GREATEST(n_chars + ${ScaleQueries.bucketSql("doc_id")} % 120 - 60,
            0) // 100 AS b
        FROM documents),
      cells AS (SELECT lang, a, b, COUNT(*)::BIGINT AS n
        FROM ann GROUP BY lang, a, b),
      tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS agree
        FROM cells GROUP BY lang),
      ra AS (SELECT lang, a, CAST(SUM(n) AS BIGINT) AS ra
        FROM cells GROUP BY lang, a),
      cb AS (SELECT lang, b, CAST(SUM(n) AS BIGINT) AS cb
        FROM cells GROUP BY lang, b),
      pe AS (SELECT ra.lang, CAST(SUM(ra.ra * cb.cb) AS BIGINT) AS pe_num
        FROM ra JOIN cb ON ra.lang = cb.lang AND ra.a = cb.b
        GROUP BY ra.lang)
      SELECT tot.lang, tot.n_rows, tot.agree,
        COALESCE(pe.pe_num, 0)::BIGINT AS pe_num,
        ROUND(tot.agree::DOUBLE / tot.n_rows::DOUBLE, 6) AS agree_rate,
        CASE WHEN tot.n_rows * tot.n_rows <> COALESCE(pe.pe_num, 0)
          THEN ROUND((tot.n_rows * tot.agree - COALESCE(pe.pe_num, 0))
              ::DOUBLE /
            (tot.n_rows * tot.n_rows - COALESCE(pe.pe_num, 0))::DOUBLE, 6)
          ELSE NULL END AS kappa
      FROM tot LEFT JOIN pe ON tot.lang = pe.lang ORDER BY tot.lang"""))

  /** χ² term selection per language ([[graft.scale.Eval.chiSquareTerms]]):
    * top-15 tokens most associated with each lang by doc-presence
    * contingency, minDf 3 — "which vocabulary separates the subcorpora".
    * det = ad−bc stays int64; the χ² ratio uses one canonical IEEE
    * parenthesization replayed verbatim, so even the DESC ordering on
    * the statistic is engine-stable.
    */
  private val q175 = GQuery(
    (s, d) => graft.scale.Eval.chiSquareTerms(
        T.documents(s, d), col("lang"), col("doc_id"), col("text"),
        topK = 15, minDf = 3L)
      .orderBy(col("label"), col("pos")),
    Some("""WITH pres AS (SELECT DISTINCT lang AS lbl, doc_id AS id,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS term
        FROM documents),
      lt AS (SELECT lbl, term, COUNT(*)::BIGINT AS a_cnt
        FROM pres GROUP BY lbl, term),
      tf AS (SELECT term, CAST(SUM(a_cnt) AS BIGINT) AS tf
        FROM lt GROUP BY term HAVING CAST(SUM(a_cnt) AS BIGINT) >= 3),
      sizes AS (SELECT lang AS lbl, COUNT(DISTINCT doc_id)::BIGINT AS nl
        FROM documents GROUP BY lang),
      nt AS (SELECT CAST(SUM(nl) AS BIGINT) AS n_docs FROM sizes),
      sc AS (SELECT lt.lbl, lt.term, lt.a_cnt, tf.tf, sizes.nl, nt.n_docs,
          (lt.a_cnt * (nt.n_docs - sizes.nl - tf.tf + lt.a_cnt) -
           (sizes.nl - lt.a_cnt) * (tf.tf - lt.a_cnt))::DOUBLE AS det
        FROM lt JOIN tf USING (term) JOIN sizes USING (lbl) CROSS JOIN nt),
      chi AS (SELECT lbl, term, a_cnt, tf,
          CASE WHEN tf < n_docs AND nl < n_docs
            THEN (n_docs::DOUBLE * (det * det)) /
              ((nl::DOUBLE * (n_docs - nl)::DOUBLE) *
               (tf::DOUBLE * (n_docs - tf)::DOUBLE))
            ELSE 0.0 END AS chi2
        FROM sc),
      rk AS (SELECT lbl, term, a_cnt, tf, chi2,
          ROW_NUMBER() OVER (PARTITION BY lbl
            ORDER BY chi2 DESC, term) AS pos
        FROM chi)
      SELECT lbl AS label, pos::BIGINT AS pos, term,
        a_cnt AS df_label, tf AS df_all, ROUND(chi2, 6) AS chi2
      FROM rk WHERE pos <= 15 ORDER BY label, pos"""))

  /** Pairwise Jensen–Shannon divergence between language token
    * distributions ([[graft.scale.Eval.jsDivergence]]): the token-space
    * drift twin of q130's embedding drift. Only the vocabulary
    * intersection is joined (absent-term mass is closed-form ½·ln2·mass)
    * and the per-pair frame collapses to (x, y) count multiplicities
    * before any double sum; the oracle replays the identical
    * decomposition.
    */
  private val q176 = GQuery(
    (s, d) => graft.scale.Eval
      .jsDivergence(T.documents(s, d), col("lang"), col("text"))
      .orderBy(col("src_a"), col("src_b")),
    Some("""WITH tc AS (SELECT src, t, COUNT(*)::BIGINT AS c
        FROM (SELECT lang AS src,
            unnest(list_filter(string_split_regex(text, '\s+'),
              x -> len(x) > 0)) AS t
          FROM documents)
        GROUP BY src, t),
      tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY src),
      sh AS (SELECT a.src AS sa, b.src AS sb, a.c AS x, b.c AS y
        FROM tc a JOIN tc b ON a.t = b.t WHERE a.src < b.src),
      mult AS (SELECT sa, sb, x, y, COUNT(*)::BIGINT AS m
        FROM sh GROUP BY sa, sb, x, y),
      wt AS (SELECT mult.sa, mult.sb, mult.x, mult.y, mult.m,
          ta.n AS na, tb.n AS nb
        FROM mult JOIN tot ta ON mult.sa = ta.src
        JOIN tot tb ON mult.sb = tb.src),
      agg AS (SELECT sa, sb, CAST(SUM(m) AS BIGINT) AS shared_terms,
          CAST(SUM(m * x) AS BIGINT) AS sx,
          CAST(SUM(m * y) AS BIGINT) AS sy,
          CAST(SUM(m * CAST(ROUND(1e12 *
            ((x::DOUBLE / na::DOUBLE) *
               ln(2 * (x::DOUBLE / na::DOUBLE) /
                 ((x::DOUBLE / na::DOUBLE) + (y::DOUBLE / nb::DOUBLE))) +
             (y::DOUBLE / nb::DOUBLE) *
               ln(2 * (y::DOUBLE / nb::DOUBLE) /
                 ((x::DOUBLE / na::DOUBLE) + (y::DOUBLE / nb::DOUBLE)))))
            AS BIGINT)) AS BIGINT) AS sc_u
        FROM wt GROUP BY sa, sb),
      pairs AS (SELECT ta.src AS sa, ta.n AS na, tb.src AS sb, tb.n AS nb
        FROM tot ta, tot tb WHERE ta.src < tb.src)
      SELECT pairs.sa AS src_a, pairs.sb AS src_b,
        COALESCE(agg.shared_terms, 0)::BIGINT AS shared_terms,
        ROUND(ln(2) / 2 *
            ((1 - COALESCE(agg.sx, 0)::DOUBLE / pairs.na::DOUBLE) +
             (1 - COALESCE(agg.sy, 0)::DOUBLE / pairs.nb::DOUBLE)) +
          COALESCE(agg.sc_u, 0)::DOUBLE / 2e12, 6) AS jsd,
        ROUND((ln(2) / 2 *
            ((1 - COALESCE(agg.sx, 0)::DOUBLE / pairs.na::DOUBLE) +
             (1 - COALESCE(agg.sy, 0)::DOUBLE / pairs.nb::DOUBLE)) +
          COALESCE(agg.sc_u, 0)::DOUBLE / 2e12) / ln(2), 6) AS jsd_norm
      FROM pairs LEFT JOIN agg
        ON pairs.sa = agg.sa AND pairs.sb = agg.sb
      ORDER BY src_a, src_b"""))

  /** Multinomial Naive Bayes lang-ID
    * ([[graft.scale.Classify.naiveBayesConfusion]]): train on the
    * corpus, score the corpus, emit the confusion matrix. The oracle
    * replays the entire model — integer micro-unit log-probabilities,
    * int64 score sums, argmax with label tiebreak — so a hash-match
    * certifies every per-document prediction, not just the counts.
    */
  private val q177 = GQuery(
    (s, d) => graft.scale.Classify.naiveBayesConfusion(
        T.documents(s, d), col("doc_id"), col("lang"), col("text"))
      .orderBy(col("label"), col("pred")),
    Some("""WITH toks AS (SELECT doc_id AS id, lang AS lbl,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS t
        FROM documents),
      dt AS (SELECT id, lbl, t, COUNT(*)::BIGINT AS tc
        FROM toks GROUP BY id, lbl, t),
      ct AS (SELECT lbl, t, COUNT(*)::BIGINT AS c
        FROM toks GROUP BY lbl, t),
      u AS (SELECT lbl, t,
          CAST(round(1000000 * ln((c + 1)::DOUBLE)) AS BIGINT) AS u
        FROM ct),
      tl AS (SELECT lbl, CAST(SUM(c) AS BIGINT) AS tl FROM ct GROUP BY lbl),
      v AS (SELECT COUNT(DISTINCT t)::BIGINT AS v FROM ct),
      pri AS (SELECT lang AS lbl, COUNT(*)::BIGINT AS nl
        FROM documents GROUP BY lang),
      nn AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM pri),
      stats AS (SELECT pri.lbl AS cls,
          CAST(round(1000000 * ln((tl.tl + v.v)::DOUBLE)) AS BIGINT)
            AS base_u,
          CAST(round(1000000 * ln(pri.nl::DOUBLE)) AS BIGINT) -
            CAST(round(1000000 * ln(nn.n::DOUBLE)) AS BIGINT) AS prior_u
        FROM pri JOIN tl ON pri.lbl = tl.lbl CROSS JOIN v CROSS JOIN nn),
      sc AS (SELECT dt.id, dt.lbl AS truth, s.cls,
          MAX(s.prior_u) + CAST(SUM(dt.tc * COALESCE(u.u, 0)) AS BIGINT)
            - CAST(SUM(dt.tc) AS BIGINT) * MAX(s.base_u) AS score
        FROM dt CROSS JOIN stats s
        LEFT JOIN u ON u.lbl = s.cls AND u.t = dt.t
        GROUP BY dt.id, dt.lbl, s.cls),
      pred AS (SELECT id, truth, cls,
          ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY score DESC, cls) AS rn
        FROM sc)
      SELECT truth AS label, cls AS pred, COUNT(*)::BIGINT AS n
      FROM pred WHERE rn = 1 GROUP BY truth, cls
      ORDER BY label, pred"""))

  /** TRAINED char-trigram language-ID
    * ([[graft.scale.Classify.langIdNgramConfusion]] — the CCNet/fastText
    * classifier q177's word-token NB graduates to): hashed char-3-gram
    * buckets (62-bit portable hash mod 4096) as evidence, same integer
    * micro-unit NB model and int64 argmax. The oracle replays the ENTIRE
    * model — every gram window, every portable bucket hash, the
    * per-(label, bucket) log-unit table, priors, unseen mass, argmax
    * tiebreak — so a hash-match certifies every per-document prediction
    * of the trained profile classifier, not just the matrix counts.
    */
  private val q219 = GQuery(
    (s, d) => graft.scale.Classify.langIdNgramConfusion(
        T.documents(s, d), col("doc_id"), col("lang"), col("text"),
        n = 3, buckets = 4096)
      .orderBy(col("label"), col("pred")),
    Some(s"""WITH gr AS (SELECT doc_id AS id, lang AS lbl,
          unnest(CASE WHEN len(text) >= 3
            THEN list_transform(range(1, len(text) - 1),
              i -> substr(text, i, 3))
            ELSE [text] END) AS gs
        FROM documents),
      toks AS (SELECT id, lbl,
          (${ScaleQueries.h62Sql("gs")}) % 4096 AS t
        FROM gr),
      dt AS (SELECT id, lbl, t, COUNT(*)::BIGINT AS tc
        FROM toks GROUP BY id, lbl, t),
      ct AS (SELECT lbl, t, COUNT(*)::BIGINT AS c
        FROM toks GROUP BY lbl, t),
      u AS (SELECT lbl, t,
          CAST(round(1000000 * ln((c + 1)::DOUBLE)) AS BIGINT) AS u
        FROM ct),
      tl AS (SELECT lbl, CAST(SUM(c) AS BIGINT) AS tl FROM ct GROUP BY lbl),
      v AS (SELECT COUNT(DISTINCT t)::BIGINT AS v FROM ct),
      pri AS (SELECT lang AS lbl, COUNT(*)::BIGINT AS nl
        FROM documents GROUP BY lang),
      nn AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM pri),
      stats AS (SELECT pri.lbl AS cls,
          CAST(round(1000000 * ln((tl.tl + v.v)::DOUBLE)) AS BIGINT)
            AS base_u,
          CAST(round(1000000 * ln(pri.nl::DOUBLE)) AS BIGINT) -
            CAST(round(1000000 * ln(nn.n::DOUBLE)) AS BIGINT) AS prior_u
        FROM pri JOIN tl ON pri.lbl = tl.lbl CROSS JOIN v CROSS JOIN nn),
      sc AS (SELECT dt.id, dt.lbl AS truth, s.cls,
          MAX(s.prior_u) + CAST(SUM(dt.tc * COALESCE(u.u, 0)) AS BIGINT)
            - CAST(SUM(dt.tc) AS BIGINT) * MAX(s.base_u) AS score
        FROM dt CROSS JOIN stats s
        LEFT JOIN u ON u.lbl = s.cls AND u.t = dt.t
        GROUP BY dt.id, dt.lbl, s.cls),
      pred AS (SELECT id, truth, cls,
          ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY score DESC, cls) AS rn
        FROM sc)
      SELECT truth AS label, cls AS pred, COUNT(*)::BIGINT AS n
      FROM pred WHERE rn = 1 GROUP BY truth, cls
      ORDER BY label, pred"""))

  /** Per-paragraph language SEGMENTATION
    * ([[graft.scale.Classify.langIdSegmentParagraphs]] — the CCNet
    * mixed-page step q219's doc-level classifier can't do): profiles
    * trained on the labeled documents, then scored over a deterministic
    * MIXED-LANGUAGE fixture both engines build identically — each doc
    * becomes three paragraphs (own text, XOR-partner doc's text, own text
    * again), so the majority language and the minority paragraph are
    * known by construction wherever the partner's language differs. The
    * oracle replays the ENTIRE path — profile training, per-paragraph
    * gram/bucket evidence, int64 NB argmax per paragraph, the
    * paragraph-count majority with label tiebreak, and the kept-text
    * reassembly in paragraph order — so one hash-match certifies doc
    * splitting, frozen-model scoring, majority voting, and ordered
    * reassembly at once.
    */
  private val q225 = GQuery(
    (s, d) => {
      val docs = T.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
      val partner = docs.select(col("doc_id").as("pid"),
        col("text").as("ptext"))
      val mixed = docs
        .withColumn("pid", col("doc_id").bitwiseXOR(lit(1L)))
        .join(partner, "pid")
        .select(col("doc_id"),
          concat(col("text"), lit("\n\n"), col("ptext"), lit("\n\n"),
            col("text")).as("text"))
      graft.scale.Classify.langIdSegmentParagraphs(
          docs, mixed, "doc_id", "lang", "text", n = 3, buckets = 4096)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH gr AS (SELECT doc_id AS id, lang AS lbl,
          unnest(CASE WHEN len(text) >= 3
            THEN list_transform(range(1, len(text) - 1),
              i -> substr(text, i, 3))
            ELSE [text] END) AS gs
        FROM documents),
      toks AS (SELECT id, lbl,
          (${ScaleQueries.h62Sql("gs")}) % 4096 AS t
        FROM gr),
      ct AS (SELECT lbl, t, COUNT(*)::BIGINT AS c
        FROM toks GROUP BY lbl, t),
      u AS (SELECT lbl, t,
          CAST(round(1000000 * ln((c + 1)::DOUBLE)) AS BIGINT) AS u
        FROM ct),
      tl AS (SELECT lbl, CAST(SUM(c) AS BIGINT) AS tl FROM ct GROUP BY lbl),
      v AS (SELECT COUNT(DISTINCT t)::BIGINT AS v FROM ct),
      pri AS (SELECT lang AS lbl, COUNT(*)::BIGINT AS nl
        FROM documents GROUP BY lang),
      nn AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM pri),
      stats AS (SELECT pri.lbl AS cls,
          CAST(round(1000000 * ln((tl.tl + v.v)::DOUBLE)) AS BIGINT)
            AS base_u,
          CAST(round(1000000 * ln(pri.nl::DOUBLE)) AS BIGINT) -
            CAST(round(1000000 * ln(nn.n::DOUBLE)) AS BIGINT) AS prior_u
        FROM pri JOIN tl ON pri.lbl = tl.lbl CROSS JOIN v CROSS JOIN nn),
      paras AS (
        SELECT d1.doc_id, 0 AS idx, d1.text AS para FROM documents d1
        UNION ALL
        SELECT d1.doc_id, 1 AS idx, d2.text FROM documents d1
          JOIN documents d2 ON d2.doc_id = xor(d1.doc_id, 1::BIGINT)
        UNION ALL
        SELECT doc_id, 2 AS idx, text FROM documents),
      pg AS (SELECT doc_id, idx,
          unnest(CASE WHEN len(para) >= 3
            THEN list_transform(range(1, len(para) - 1),
              i -> substr(para, i, 3))
            ELSE [para] END) AS gs
        FROM paras WHERE len(trim(para)) > 0),
      pt AS (SELECT doc_id, idx,
          (${ScaleQueries.h62Sql("gs")}) % 4096 AS t
        FROM pg),
      dt AS (SELECT doc_id, idx, t, COUNT(*)::BIGINT AS tc
        FROM pt GROUP BY doc_id, idx, t),
      sc AS (SELECT dt.doc_id, dt.idx, s.cls,
          MAX(s.prior_u) + CAST(SUM(dt.tc * COALESCE(u.u, 0)) AS BIGINT)
            - CAST(SUM(dt.tc) AS BIGINT) * MAX(s.base_u) AS score
        FROM dt CROSS JOIN stats s
        LEFT JOIN u ON u.lbl = s.cls AND u.t = dt.t
        GROUP BY dt.doc_id, dt.idx, s.cls),
      pp AS (SELECT doc_id, idx, cls AS pred FROM (
          SELECT doc_id, idx, cls, ROW_NUMBER() OVER (
            PARTITION BY doc_id, idx ORDER BY score DESC, cls) AS rn
          FROM sc) WHERE rn = 1),
      dom AS (SELECT doc_id, pred AS lang FROM (
          SELECT doc_id, pred, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY COUNT(*) DESC, pred) AS rn
          FROM pp GROUP BY doc_id, pred) WHERE rn = 1)
      SELECT paras.doc_id, dom.lang,
        COUNT(*)::BIGINT AS n_paras,
        CAST(SUM(CASE WHEN pp.pred = dom.lang THEN 1 ELSE 0 END)
          AS BIGINT) AS n_kept,
        string_agg(CASE WHEN pp.pred = dom.lang THEN paras.para END,
          chr(10) || chr(10) ORDER BY paras.idx) AS text_kept
      FROM paras
      JOIN pp ON pp.doc_id = paras.doc_id AND pp.idx = paras.idx
      JOIN dom ON dom.doc_id = paras.doc_id
      GROUP BY paras.doc_id, dom.lang
      ORDER BY paras.doc_id"""))

  /** Full precision/recall operating-point table per language
    * ([[graft.scale.Eval.prCurve]]): one row per distinct score unit,
    * exact int64 TP/FP/FN from descending prefix sums — same q168
    * synthetic scorer as q171. The oracle replays every threshold row.
    */
  private val q178 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.prCurve(
        T.documents(s, d).select(col("lang"), u1.as("u"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("u"), col("y"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"), col("threshold_unit"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS u,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      per AS (SELECT lang, u, CAST(SUM(y) AS BIGINT) AS pos,
          CAST(SUM(1 - y) AS BIGINT) AS neg
        FROM sl GROUP BY lang, u),
      cum AS (SELECT lang, u, pos, neg,
          SUM(pos) OVER (PARTITION BY lang ORDER BY u DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS tp,
          SUM(neg) OVER (PARTITION BY lang ORDER BY u DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS fp,
          SUM(pos) OVER (PARTITION BY lang)::BIGINT AS p_tot
        FROM per)
      SELECT lang, u AS threshold_unit, tp, fp, p_tot - tp AS fn,
        CASE WHEN tp + fp > 0
          THEN ROUND(tp::DOUBLE / (tp + fp)::DOUBLE, 6) END AS precision,
        CASE WHEN p_tot > 0
          THEN ROUND(tp::DOUBLE / p_tot::DOUBLE, 6) END AS recall,
        CASE WHEN 2 * tp + fp + (p_tot - tp) > 0
          THEN ROUND((2 * tp)::DOUBLE /
            (2 * tp + fp + (p_tot - tp))::DOUBLE, 6) END AS f1
      FROM cum ORDER BY lang, threshold_unit"""))

  /** Expected calibration error per language
    * ([[graft.scale.Eval.calibrationError]]): the q168 reliability
    * diagram's scalar summary, via the integer telescoping
    * ECE = Σ|1000·pos_b − su_b| / (1000·N) — certifiable to the last
    * bit because no per-bin float mean ever exists.
    */
  private val q179 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.calibrationError(
        T.documents(s, d).select(col("lang"), u1.as("u"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("u"), col("y"), bins = 10)
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS u,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      pb AS (SELECT lang,
          LEAST(GREATEST(CAST(floor(u / 1000.0 * 10) AS BIGINT), 0), 9)
            AS bin,
          COUNT(*)::BIGINT AS n, CAST(SUM(y) AS BIGINT) AS pos,
          CAST(SUM(u) AS BIGINT) AS su
        FROM sl GROUP BY lang, bin)
      SELECT lang, CAST(SUM(n) AS BIGINT) AS n_rows,
        CAST(SUM(ABS(1000 * pos - su)) AS BIGINT) AS dev_num,
        ROUND(SUM(ABS(1000 * pos - su))::DOUBLE /
          (1000 * SUM(n))::DOUBLE, 6) AS ece
      FROM pb GROUP BY lang ORDER BY lang"""))

  /** McNemar paired-classifier test per language
    * ([[graft.scale.Eval.mcnemar]]): classifier A thresholds the
    * synthetic score at 500; classifier B sees the score through a
    * deterministic ±50 jitter substream — "is B different from A on
    * the same rows" with only the discordant int64 counts deciding.
    */
  private val q180 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      val u3 = pmod(graft.scale.Sampling.portableBucket(
        col("doc_id") * 7L + 3L), lit(100L))
      graft.scale.Eval.mcnemar(
        T.documents(s, d).select(col("lang"),
          (u2 < u1).cast("long").as("y"),
          (u1 >= 500L).cast("long").as("pa"),
          (u1 + u3 - 50L >= 500L).cast("long").as("pb")),
        col("lang"), col("y"), col("pa"), col("pb"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang,
          ${ScaleQueries.bucketSql("doc_id")} AS bk,
          ${ScaleQueries.bucketSql("(doc_id * 7 + 3)")} % 100 AS u3
        FROM documents),
      sl AS (SELECT lang,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y,
          CASE WHEN bk % 1000 >= 500 THEN 1 ELSE 0 END AS pa,
          CASE WHEN bk % 1000 + u3 - 50 >= 500 THEN 1 ELSE 0 END AS pb
        FROM b),
      m AS (SELECT lang,
          CASE WHEN pa = y THEN 1 ELSE 0 END AS ao,
          CASE WHEN pb = y THEN 1 ELSE 0 END AS bo
        FROM sl),
      agg AS (SELECT lang, COUNT(*)::BIGINT AS n,
          CAST(SUM(ao) AS BIGINT) AS a_correct,
          CAST(SUM(bo) AS BIGINT) AS b_correct,
          CAST(SUM(ao * (1 - bo)) AS BIGINT) AS b_disc,
          CAST(SUM((1 - ao) * bo) AS BIGINT) AS c_disc
        FROM m GROUP BY lang)
      SELECT lang, n, a_correct, b_correct, b_disc, c_disc,
        ROUND(a_correct::DOUBLE / n::DOUBLE, 6) AS acc_a,
        ROUND(b_correct::DOUBLE / n::DOUBLE, 6) AS acc_b,
        CASE WHEN b_disc + c_disc > 0
          THEN ROUND(((ABS(b_disc - c_disc) - 1) *
              (ABS(b_disc - c_disc) - 1))::DOUBLE /
            (b_disc + c_disc)::DOUBLE, 6) END AS chi2_cc
      FROM agg ORDER BY lang"""))

  /** Selection/error-rate fairness audit across languages
    * ([[graft.scale.Eval.fairnessAudit]]): does the synthetic quality
    * gate select uniformly across subcorpora? Disparate impact is the
    * exact integer cross-product ratio vs the overall rate — the
    * pre-training-mix representation check.
    */
  private val q181 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.fairnessAudit(
        T.documents(s, d).select(col("lang"),
          (u2 < u1).cast("long").as("y"),
          (u1 >= 400L).cast("long").as("p")),
        col("lang"), col("y"), col("p"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y,
          CASE WHEN bk % 1000 >= 400 THEN 1 ELSE 0 END AS p
        FROM b),
      per AS (SELECT lang, COUNT(*)::BIGINT AS n,
          CAST(SUM(p) AS BIGINT) AS sel,
          CAST(SUM(y) AS BIGINT) AS pos,
          CAST(SUM(p * y) AS BIGINT) AS tp,
          CAST(SUM(p * (1 - y)) AS BIGINT) AS fp
        FROM sl GROUP BY lang),
      ov AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all,
          CAST(SUM(sel) AS BIGINT) AS sel_all FROM per)
      SELECT lang, n, sel,
        ROUND(sel::DOUBLE / n::DOUBLE, 6) AS sel_rate,
        CASE WHEN pos > 0
          THEN ROUND(tp::DOUBLE / pos::DOUBLE, 6) END AS tpr,
        CASE WHEN n - pos > 0
          THEN ROUND(fp::DOUBLE / (n - pos)::DOUBLE, 6) END AS fpr,
        CASE WHEN sel_all > 0
          THEN ROUND((sel * n_all)::DOUBLE / (n * sel_all)::DOUBLE, 6)
          END AS disparate_impact
      FROM per CROSS JOIN ov ORDER BY lang"""))

  /** Held-out Kneser–Ney bigram cross-entropy per language
    * ([[graft.scale.Lm.knBigramCrossEntropy]]): train on even doc_ids,
    * score odd doc_ids — the distribution-shift instrument q89's
    * in-corpus Laplace probe cannot be (a memorized template scores
    * perfectly in-corpus; held-out KN exposes it). The oracle replays
    * the whole model: bigram types, continuation fan-ins/outs, the
    * canonical interpolated-KN expression, micro-unit quantization,
    * and the exact integer NLL sums.
    */
  private val q182 = GQuery(
    (s, d) => {
      val all = T.documents(s, d)
      graft.scale.Lm.knBigramCrossEntropy(
        all.where(pmod(col("doc_id"), lit(2L)) === 0L),
        all.where(pmod(col("doc_id"), lit(2L)) === 1L),
        col("lang"), col("text"))
        .withColumnRenamed("source", "lang")
        .orderBy(col("lang"))
    },
    Some("""WITH trt AS (SELECT
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
            AS t
        FROM documents WHERE doc_id % 2 = 0),
      bt AS (SELECT string_split(bigram, ' ')[1] AS w1,
          string_split(bigram, ' ')[2] AS w2
        FROM (SELECT unnest(list_transform(range(2, len(t) + 1),
            i -> t[i-1] || ' ' || t[i])) AS bigram
          FROM trt)),
      cb AS (SELECT w1, w2, COUNT(*)::BIGINT AS cb
        FROM bt GROUP BY w1, w2),
      heads AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1,
          COUNT(*)::BIGINT AS n1f
        FROM cb GROUP BY w1),
      tails AS (SELECT w2, COUNT(*)::BIGINT AS n1b FROM cb GROUP BY w2),
      consts AS (SELECT (SELECT COUNT(*)::BIGINT FROM cb) AS tt,
          (SELECT COUNT(DISTINCT tok)::BIGINT
            FROM (SELECT unnest(t) AS tok FROM trt)) AS v),
      evt AS (SELECT lang,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
            AS t
        FROM documents WHERE doc_id % 2 = 1),
      be AS (SELECT lang AS src, string_split(bigram, ' ')[1] AS w1,
          string_split(bigram, ' ')[2] AS w2
        FROM (SELECT lang, unnest(list_transform(range(2, len(t) + 1),
            i -> t[i-1] || ' ' || t[i])) AS bigram
          FROM evt)),
      bem AS (SELECT src, w1, w2, COUNT(*)::BIGINT AS m
        FROM be GROUP BY src, w1, w2),
      sc AS (SELECT bem.src, bem.m,
          CASE WHEN tails.n1b IS NULL THEN 1 ELSE 0 END AS oov,
          -CAST(round(1000000.0 * ln(
            CASE WHEN heads.c1 IS NOT NULL
              THEN GREATEST(COALESCE(cb.cb, 0)::DOUBLE - 0.75, 0.0) /
                  heads.c1::DOUBLE +
                (0.75 * heads.n1f::DOUBLE / heads.c1::DOUBLE) *
                  ((COALESCE(tails.n1b, 0) + 1)::DOUBLE /
                   (consts.tt + consts.v + 1)::DOUBLE)
              ELSE (COALESCE(tails.n1b, 0) + 1)::DOUBLE /
                (consts.tt + consts.v + 1)::DOUBLE
            END)) AS BIGINT) AS lpu
        FROM bem LEFT JOIN cb ON bem.w1 = cb.w1 AND bem.w2 = cb.w2
        LEFT JOIN heads ON bem.w1 = heads.w1
        LEFT JOIN tails ON bem.w2 = tails.w2
        CROSS JOIN consts)
      SELECT src AS lang, CAST(SUM(m) AS BIGINT) AS n_bigrams,
        CAST(SUM(m * oov) AS BIGINT) AS n_oov,
        CAST(SUM(m * lpu) AS BIGINT) AS nll_units,
        ROUND(SUM(m * lpu)::DOUBLE / (1000000.0 * SUM(m)::DOUBLE), 6)
          AS ce_nats,
        ROUND(exp(SUM(m * lpu)::DOUBLE / (1000000.0 * SUM(m)::DOUBLE)), 6)
          AS ppl
      FROM sc GROUP BY src ORDER BY lang"""))

  /** Weight-of-evidence / information-value screen per language bucket
    * ([[graft.scale.Features.woeEncoding]]) against the q171-style
    * synthesized binary label: Laplace(+1)-adjusted bucket rates, ln
    * ratio, per-bucket IV term. One combinable count pass; the bucket
    * frame (|langs| rows) is the only state past it. ln follows the
    * q163 round-6 precedent.
    */
  private val q184 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Features.woeEncoding(
        T.documents(s, d).select(col("lang"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("y"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      base AS (SELECT lang AS bucket,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      cells AS (SELECT bucket, CAST(SUM(y) AS BIGINT) AS pos,
          COUNT(*)::BIGINT - CAST(SUM(y) AS BIGINT) AS neg
        FROM base GROUP BY bucket),
      tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS pt,
          CAST(SUM(neg) AS BIGINT) AS nt, COUNT(*)::BIGINT AS nb
        FROM cells)
      SELECT bucket, pos, neg,
        ROUND(ln(((pos + 1)::DOUBLE / (pt + nb)::DOUBLE) /
                 ((neg + 1)::DOUBLE / (nt + nb)::DOUBLE)), 6) AS woe,
        ROUND((((pos + 1)::DOUBLE / (pt + nb)::DOUBLE) -
               ((neg + 1)::DOUBLE / (nt + nb)::DOUBLE)) *
              ln(((pos + 1)::DOUBLE / (pt + nb)::DOUBLE) /
                 ((neg + 1)::DOUBLE / (nt + nb)::DOUBLE)), 6) AS iv_term
      FROM cells CROSS JOIN tot ORDER BY bucket"""))

  /** Leave-one-out target encoding with additive smoothing
    * ([[graft.scale.Features.looTargetEncode]]) over the same synthesized
    * label: te = (sum_y(bucket) − y_row + m·prior)/(n(bucket) − 1 + m),
    * m = 10. One combinable bucket aggregate joined back on the bucket
    * key — no window, no self-join; the oracle replays every per-row
    * division, so a hash-match certifies the whole encoded frame.
    */
  private val q185 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Features.looTargetEncode(
        T.documents(s, d).select(col("doc_id"), col("lang"),
          (u2 < u1).cast("long").as("y")),
        col("doc_id"), col("lang"), col("y"), m = 10L)
        .orderBy(col("id"))
    },
    Some(s"""WITH b AS (SELECT doc_id, lang,
          ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      base AS (SELECT doc_id AS id, lang AS bucket,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      per AS (SELECT bucket, CAST(SUM(y) AS BIGINT) AS sy,
          COUNT(*)::BIGINT AS nb
        FROM base GROUP BY bucket),
      tot AS (SELECT CAST(SUM(sy) AS BIGINT) AS pt,
          CAST(SUM(nb) AS BIGINT) AS n FROM per)
      SELECT id, bucket, y::BIGINT AS y,
        ROUND(((sy - y)::DOUBLE + 10.0 * pt::DOUBLE / n::DOUBLE) /
              ((nb - 1)::DOUBLE + 10.0), 6) AS te
      FROM base JOIN per USING (bucket) CROSS JOIN tot ORDER BY id"""))

  /** Held-out Naive Bayes ([[graft.scale.Classify.naiveBayesScore]]):
    * fit the multinomial model on even doc_ids, score odd doc_ids —
    * the eval-split twin of q177's resubstitution fit, and the query
    * that exercises genuine OOV handling (scoring-side tokens absent
    * from the training vocabulary pay the full unseen-mass penalty via
    * the LEFT term join). The oracle replays the whole split model:
    * train-side integer micro-unit log-probabilities, int64 score
    * sums over the scoring frame, argmax with label tiebreak.
    */
  private val q186 = GQuery(
    (s, d) => {
      val all = T.documents(s, d)
      graft.scale.Classify.naiveBayesHeldOutConfusion(
        all.where(pmod(col("doc_id"), lit(2L)) === 0L),
        all.where(pmod(col("doc_id"), lit(2L)) === 1L),
        col("doc_id"), col("lang"), col("text"))
        .orderBy(col("label"), col("pred"))
    },
    Some("""WITH tr AS (SELECT doc_id, lang, text FROM documents
          WHERE doc_id % 2 = 0),
      ev AS (SELECT doc_id, lang, text FROM documents
          WHERE doc_id % 2 = 1),
      ttoks AS (SELECT lang AS lbl,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS t
        FROM tr),
      ct AS (SELECT lbl, t, COUNT(*)::BIGINT AS c
        FROM ttoks GROUP BY lbl, t),
      u AS (SELECT lbl, t,
          CAST(round(1000000 * ln((c + 1)::DOUBLE)) AS BIGINT) AS u
        FROM ct),
      tl AS (SELECT lbl, CAST(SUM(c) AS BIGINT) AS tl FROM ct GROUP BY lbl),
      v AS (SELECT COUNT(DISTINCT t)::BIGINT AS v FROM ct),
      pri AS (SELECT lang AS lbl, COUNT(*)::BIGINT AS nl
        FROM tr GROUP BY lang),
      nn AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM pri),
      stats AS (SELECT pri.lbl AS cls,
          CAST(round(1000000 * ln((tl.tl + v.v)::DOUBLE)) AS BIGINT)
            AS base_u,
          CAST(round(1000000 * ln(pri.nl::DOUBLE)) AS BIGINT) -
            CAST(round(1000000 * ln(nn.n::DOUBLE)) AS BIGINT) AS prior_u
        FROM pri JOIN tl ON pri.lbl = tl.lbl CROSS JOIN v CROSS JOIN nn),
      stoks AS (SELECT doc_id AS id, lang AS truth,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS t
        FROM ev),
      dt AS (SELECT id, truth, t, COUNT(*)::BIGINT AS tc
        FROM stoks GROUP BY id, truth, t),
      sc AS (SELECT dt.id, dt.truth, s.cls,
          MAX(s.prior_u) + CAST(SUM(dt.tc * COALESCE(u.u, 0)) AS BIGINT)
            - CAST(SUM(dt.tc) AS BIGINT) * MAX(s.base_u) AS score
        FROM dt CROSS JOIN stats s
        LEFT JOIN u ON u.lbl = s.cls AND u.t = dt.t
        GROUP BY dt.id, dt.truth, s.cls),
      pred AS (SELECT id, truth, cls,
          ROW_NUMBER() OVER (PARTITION BY id
            ORDER BY score DESC, cls) AS rn
        FROM sc)
      SELECT truth AS label, cls AS pred, COUNT(*)::BIGINT AS n
      FROM pred WHERE rn = 1 GROUP BY truth, cls
      ORDER BY label, pred"""))

  /** Cumulative gains / lift table per language
    * ([[graft.scale.Eval.liftTable]]) over the q171 synthetic scorer:
    * ten decile cuts, tie-aware fractional interpolation inside the
    * straddling score unit, all boundary arithmetic exact int64 on the
    * collapsed contingency. For the calibrated P(y|u)=u scorer the
    * top-decile lift lands near 1.9 — replayed exactly by the oracle's
    * identical prefix sums and divisions.
    */
  private val q187 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.liftTable(
        T.documents(s, d).select(col("lang"), u1.as("u"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("u"), col("y"), buckets = 10)
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"), col("bucket"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS u,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      per AS (SELECT lang, u, COUNT(*)::BIGINT AS n,
          CAST(SUM(y) AS BIGINT) AS pos
        FROM sl GROUP BY lang, u),
      pre AS (SELECT lang, u, n, pos,
          COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY u DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS rows_above,
          COALESCE(SUM(pos) OVER (PARTITION BY lang ORDER BY u DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS pos_above,
          SUM(n) OVER (PARTITION BY lang)::BIGINT AS nn,
          CAST(SUM(pos) OVER (PARTITION BY lang) AS BIGINT) AS np
        FROM per),
      ex AS (SELECT lang, k, nn, np, rows_above, pos_above, n, pos
        FROM pre CROSS JOIN (SELECT unnest(range(1, 11)) AS k)
        WHERE rows_above * 10 < k * nn AND k * nn <= (rows_above + n) * 10)
      SELECT lang, k::BIGINT AS bucket, nn AS n_rows, np AS n_pos,
        ROUND(pos_above::DOUBLE +
          (k * nn - rows_above * 10)::DOUBLE * pos::DOUBLE /
            (10.0 * n::DOUBLE), 6) AS cum_pos,
        CASE WHEN np > 0 THEN ROUND((pos_above::DOUBLE +
          (k * nn - rows_above * 10)::DOUBLE * pos::DOUBLE /
            (10.0 * n::DOUBLE)) / np::DOUBLE, 6) END AS gain,
        CASE WHEN np > 0 THEN ROUND((pos_above::DOUBLE +
          (k * nn - rows_above * 10)::DOUBLE * pos::DOUBLE /
            (10.0 * n::DOUBLE)) * 10.0 / (np::DOUBLE * k::DOUBLE), 6)
          END AS lift
      FROM ex ORDER BY lang, bucket"""))

  /** Per-label top terms by mutual information
    * ([[graft.scale.Eval.mutualInfoTerms]]) — q175's
    * information-theoretic twin over the same presence contingency,
    * with an EXACT integer ranking key: each of the 4 cell terms is
    * quantized to pico-units and summed in int64, so the top-k order
    * can't depend on float evaluation order. Oracle replays cell by
    * cell.
    */
  private val q188 = GQuery(
    (s, d) => graft.scale.Eval.mutualInfoTerms(
        T.documents(s, d), col("lang"), col("doc_id"), col("text"),
        topK = 15, minDf = 3L)
      .orderBy(col("label"), col("pos")),
    Some("""WITH pres AS (SELECT DISTINCT lang AS lbl, doc_id AS id,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS term
        FROM documents),
      lt AS (SELECT lbl, term, COUNT(*)::BIGINT AS a
        FROM pres GROUP BY lbl, term),
      tf AS (SELECT term, CAST(SUM(a) AS BIGINT) AS tf
        FROM lt GROUP BY term HAVING CAST(SUM(a) AS BIGINT) >= 3),
      sizes AS (SELECT lang AS lbl, COUNT(DISTINCT doc_id)::BIGINT AS nl
        FROM documents GROUP BY lang),
      nt AS (SELECT CAST(SUM(nl) AS BIGINT) AS n FROM sizes),
      sc AS (SELECT lt.lbl, lt.term, lt.a, tf.tf, sizes.nl, nt.n
        FROM lt JOIN tf USING (term) JOIN sizes USING (lbl) CROSS JOIN nt),
      mi AS (SELECT lbl, term, a, tf,
          (CASE WHEN a > 0
            THEN CAST(round(1e12 * (a::DOUBLE / n::DOUBLE) *
              ln(n::DOUBLE * a::DOUBLE / (tf::DOUBLE * nl::DOUBLE)))
              AS BIGINT) ELSE 0 END +
           CASE WHEN nl - a > 0
            THEN CAST(round(1e12 * ((nl - a)::DOUBLE / n::DOUBLE) *
              ln(n::DOUBLE * (nl - a)::DOUBLE /
                ((n - tf)::DOUBLE * nl::DOUBLE))) AS BIGINT) ELSE 0 END +
           CASE WHEN tf - a > 0
            THEN CAST(round(1e12 * ((tf - a)::DOUBLE / n::DOUBLE) *
              ln(n::DOUBLE * (tf - a)::DOUBLE /
                (tf::DOUBLE * (n - nl)::DOUBLE))) AS BIGINT) ELSE 0 END +
           CASE WHEN n - nl - tf + a > 0
            THEN CAST(round(1e12 * ((n - nl - tf + a)::DOUBLE / n::DOUBLE) *
              ln(n::DOUBLE * (n - nl - tf + a)::DOUBLE /
                ((n - tf)::DOUBLE * (n - nl)::DOUBLE))) AS BIGINT)
            ELSE 0 END) AS mi_u
        FROM sc),
      rk AS (SELECT lbl, term, a, tf, mi_u,
          ROW_NUMBER() OVER (PARTITION BY lbl
            ORDER BY mi_u DESC, term) AS pos
        FROM mi)
      SELECT lbl AS label, pos::BIGINT AS pos, term,
        a AS df_label, tf AS df_all, ROUND(mi_u::DOUBLE / 1e12, 6) AS mi
      FROM rk WHERE pos <= 15 ORDER BY label, pos"""))

  /** Hashing-trick document vectorizer
    * ([[graft.scale.TextOps.featureHash]]): every token of every
    * document lands in one of 64 signed buckets via the portable
    * 62-bit hash — the oracle recomputes the hash character by
    * character, so a hash-match certifies each document's full sparse
    * vector (index, sign and count), not a summary.
    */
  private val q189 = GQuery(
    (s, d) => graft.scale.TextOps.featureHash(
        T.documents(s, d), col("doc_id"), col("text"), dim = 64)
      .orderBy(col("id"), col("idx")),
    Some(s"""WITH toks AS (SELECT doc_id AS id,
          unnest(list_filter(string_split_regex(text, '\\s+'),
            x -> len(x) > 0)) AS tok
        FROM documents),
      h AS (SELECT id, ${ScaleQueries.h62Sql("tok")} AS h FROM toks),
      e AS (SELECT id, h % 64 AS idx, 1 - 2 * ((h >> 31) & 1) AS s
        FROM h)
      SELECT id, idx, CAST(SUM(s) AS BIGINT) AS v
      FROM e GROUP BY id, idx HAVING CAST(SUM(s) AS BIGINT) <> 0
      ORDER BY id, idx"""))

  /** Population Stability Index per language vs the pooled corpus
    * ([[graft.scale.Eval.psiVsGlobal]]) over the document-length units
    * (n_chars mod 1000) — the binned, thresholded drift monitor
    * completing KS (q172) / JSD (q176). Laplace +1 on both sides of
    * every bin; each bin term quantized once to pico-units, per-group
    * sums pure int64. The oracle replays every cell.
    */
  private val q190 = GQuery(
    (s, d) => graft.scale.Eval.psiVsGlobal(
        T.documents(s, d).select(col("lang"),
          pmod(col("n_chars"), lit(1000L)).as("u")),
        col("lang"), col("u"), bins = 10)
      .withColumnRenamed("group", "lang")
      .orderBy(col("lang")),
    Some("""WITH sl AS (SELECT lang AS g, (n_chars % 1000) AS u
        FROM documents),
      act AS (SELECT g,
          LEAST(GREATEST(CAST(floor(u / 1000.0 * 10) AS BIGINT), 0), 9)
            AS bin,
          COUNT(*)::BIGINT AS a
        FROM sl GROUP BY 1, 2),
      gbin AS (SELECT bin, CAST(SUM(a) AS BIGINT) AS e
        FROM act GROUP BY bin),
      tta AS (SELECT g, CAST(SUM(a) AS BIGINT) AS ta FROM act GROUP BY g),
      tte AS (SELECT CAST(SUM(e) AS BIGINT) AS te FROM gbin),
      cells AS (SELECT tta.g, tta.ta, gbin.bin, gbin.e,
          COALESCE(act.a, 0) AS a0, tte.te
        FROM tta CROSS JOIN gbin
        LEFT JOIN act ON act.g = tta.g AND act.bin = gbin.bin
        CROSS JOIN tte),
      terms AS (SELECT g, ta,
          CAST(round(1e12 *
            ((((a0 + 1)::DOUBLE / (ta + 10)::DOUBLE) -
              ((e + 1)::DOUBLE / (te + 10)::DOUBLE)) *
             ln(((a0 + 1)::DOUBLE / (ta + 10)::DOUBLE) /
                ((e + 1)::DOUBLE / (te + 10)::DOUBLE)))) AS BIGINT) AS tu
        FROM cells)
      SELECT g AS lang, MAX(ta) AS n_rows,
        ROUND(CAST(SUM(tu) AS BIGINT)::DOUBLE / 1e12, 6) AS psi
      FROM terms GROUP BY g ORDER BY lang"""))

  /** CUPED variance reduction per language
    * ([[graft.scale.Eval.cuped]]): pre-metric x = the q171 score unit,
    * outcome y = x + an independent jitter substream — a correlated
    * pair whose θ and ρ² the oracle replays from the same six exact
    * int64 moments (one aggregate, one division per statistic).
    */
  private val q191 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u3 = pmod(graft.scale.Sampling.portableBucket(
        col("doc_id") * 7L + 3L), lit(100L))
      graft.scale.Eval.cuped(
        T.documents(s, d).select(col("lang"), u1.as("x"),
          (u1 + u3).as("y")),
        col("lang"), col("x"), col("y"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang,
          ${ScaleQueries.bucketSql("doc_id")} AS bk,
          ${ScaleQueries.bucketSql("(doc_id * 7 + 3)")} % 100 AS u3
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS x, bk % 1000 + u3 AS y FROM b),
      agg AS (SELECT lang, COUNT(*)::BIGINT AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM sl GROUP BY lang),
      m AS (SELECT lang, n, sy,
          n * sxy - sx * sy AS cnum,
          n * sxx - sx * sx AS vx,
          n * syy - sy * sy AS vy
        FROM agg)
      SELECT lang, n,
        CASE WHEN vx > 0
          THEN ROUND(cnum::DOUBLE / vx::DOUBLE, 6) END AS theta,
        CASE WHEN vx > 0 AND vy > 0
          THEN ROUND(cnum::DOUBLE * cnum::DOUBLE /
            (vx::DOUBLE * vy::DOUBLE), 6) END AS rho2,
        ROUND(sy::DOUBLE / n::DOUBLE, 6) AS mean_y,
        ROUND(vy::DOUBLE / (n::DOUBLE * n::DOUBLE), 6) AS var_y,
        CASE WHEN vx > 0 AND vy > 0
          THEN ROUND(vy::DOUBLE / (n::DOUBLE * n::DOUBLE) *
            (1 - cnum::DOUBLE * cnum::DOUBLE /
              (vx::DOUBLE * vy::DOUBLE)), 6) END AS var_y_adj
      FROM m ORDER BY lang"""))

  /** Split-conformal calibration threshold per language
    * ([[graft.scale.Eval.conformalThreshold]]): the ⌈(n+1)·0.9⌉-th
    * smallest score unit — the distribution-free ≥90% coverage gate.
    * The order statistic is exact integer arithmetic over the unit
    * collapse; the oracle replays the cumulative walk and the div-ceil
    * k identically.
    */
  private val q193 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      graft.scale.Eval.conformalThreshold(
        T.documents(s, d).select(col("lang"), u1.as("u")),
        col("lang"), col("u"), alphaPct = 10)
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang, ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, bk % 1000 AS u FROM b),
      per AS (SELECT lang, u, COUNT(*)::BIGINT AS c
        FROM sl GROUP BY lang, u),
      cum AS (SELECT lang, u, SUM(c) OVER (PARTITION BY lang ORDER BY u
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        FROM per),
      tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n
        FROM per GROUP BY lang),
      tk AS (SELECT lang, n, ((n + 1) * 90 + 99) // 100 AS k FROM tot),
      hit AS (SELECT cum.lang, cum.u, cum.cum,
          ROW_NUMBER() OVER (PARTITION BY cum.lang ORDER BY cum.u) AS rn
        FROM cum JOIN tk ON cum.lang = tk.lang WHERE cum.cum >= tk.k),
      h1 AS (SELECT lang, u AS threshold_unit, cum AS n_covered
        FROM hit WHERE rn = 1)
      SELECT tk.lang, tk.n, tk.k,
        CASE WHEN tk.k <= tk.n THEN h1.threshold_unit END AS threshold_unit,
        CASE WHEN tk.k <= tk.n THEN h1.n_covered END AS n_covered,
        CASE WHEN tk.k <= tk.n
          THEN ROUND(h1.n_covered::DOUBLE / tk.n::DOUBLE, 6) END
          AS coverage
      FROM tk LEFT JOIN h1 ON tk.lang = h1.lang ORDER BY tk.lang"""))

  /** Two-proportion A/B readout per language
    * ([[graft.scale.Eval.abTest]]): deterministic arm assignment
    * (doc_id parity), q171's synthesized outcome; pooled z statistic
    * and the treatment arm's Wilson 95% interval — every ratio and
    * the correctly-rounded sqrt replayed verbatim by the oracle.
    */
  private val q194 = GQuery(
    (s, d) => {
      val b = graft.scale.Sampling.portableBucket(col("doc_id"))
      val u1 = pmod(b, lit(1000L))
      val u2 = pmod(((b - pmod(b, lit(1000L))) / 1000L).cast("long"),
        lit(1000L))
      graft.scale.Eval.abTest(
        T.documents(s, d).select(col("lang"),
          pmod(col("doc_id"), lit(2L)).as("t"),
          (u2 < u1).cast("long").as("y")),
        col("lang"), col("t"), col("y"))
        .withColumnRenamed("group", "lang")
        .orderBy(col("lang"))
    },
    Some(s"""WITH b AS (SELECT lang, doc_id % 2 AS t,
          ${ScaleQueries.bucketSql("doc_id")} AS bk
        FROM documents),
      sl AS (SELECT lang, t,
          CASE WHEN (bk // 1000) % 1000 < bk % 1000 THEN 1 ELSE 0 END AS y
        FROM b),
      agg AS (SELECT lang, CAST(SUM(t) AS BIGINT) AS n1,
          CAST(SUM(t * y) AS BIGINT) AS x1,
          CAST(SUM(1 - t) AS BIGINT) AS n0,
          CAST(SUM((1 - t) * y) AS BIGINT) AS x0
        FROM sl GROUP BY lang)
      SELECT lang, n1, x1, n0, x0,
        CASE WHEN n1 > 0
          THEN ROUND(x1::DOUBLE / n1::DOUBLE, 6) END AS p1,
        CASE WHEN n0 > 0
          THEN ROUND(x0::DOUBLE / n0::DOUBLE, 6) END AS p0,
        CASE WHEN n1 > 0 AND n0 > 0
          THEN ROUND(x1::DOUBLE / n1::DOUBLE - x0::DOUBLE / n0::DOUBLE, 6)
          END AS lift,
        CASE WHEN n1 > 0 AND n0 > 0 AND x1 + x0 > 0
            AND x1 + x0 < n1 + n0
          THEN ROUND((x1::DOUBLE / n1::DOUBLE - x0::DOUBLE / n0::DOUBLE) /
            sqrt((x1 + x0)::DOUBLE / (n1 + n0)::DOUBLE *
              (1.0 - (x1 + x0)::DOUBLE / (n1 + n0)::DOUBLE) *
              (1.0 / n1::DOUBLE + 1.0 / n0::DOUBLE)), 6) END AS z,
        CASE WHEN n1 > 0
          THEN ROUND((x1::DOUBLE / n1::DOUBLE +
              3.8416 / (2.0 * n1::DOUBLE)) / (1.0 + 3.8416 / n1::DOUBLE) -
            1.96 * sqrt(x1::DOUBLE / n1::DOUBLE *
                (1.0 - x1::DOUBLE / n1::DOUBLE) / n1::DOUBLE +
              3.8416 / (4.0 * n1::DOUBLE * n1::DOUBLE)) /
              (1.0 + 3.8416 / n1::DOUBLE), 6) END AS wilson_lo,
        CASE WHEN n1 > 0
          THEN ROUND((x1::DOUBLE / n1::DOUBLE +
              3.8416 / (2.0 * n1::DOUBLE)) / (1.0 + 3.8416 / n1::DOUBLE) +
            1.96 * sqrt(x1::DOUBLE / n1::DOUBLE *
                (1.0 - x1::DOUBLE / n1::DOUBLE) / n1::DOUBLE +
              3.8416 / (4.0 * n1::DOUBLE * n1::DOUBLE)) /
              (1.0 + 3.8416 / n1::DOUBLE), 6) END AS wilson_hi
      FROM agg ORDER BY lang"""))

  /** Percentile-bootstrap CI for each language's mean document-length
    * unit ([[graft.scale.Eval.bootstrapMeanCI]]): 200 deterministic
    * portable-hash resamples, int64 resample sums as the order
    * statistics, one division per output cell — the oracle replays
    * every single draw of every resample, so the hash-match certifies
    * the complete bootstrap, not a summary.
    */
  private val q196 = GQuery(
    (s, d) => graft.scale.Eval.bootstrapMeanCI(
        T.documents(s, d).select(col("lang"),
          pmod(col("n_chars"), lit(1000L)).as("u")),
        col("lang"), col("u"), m = 200, alphaPct = 5)
      .withColumnRenamed("group", "lang")
      .orderBy(col("lang")),
    Some(s"""WITH base AS (SELECT lang AS g, (n_chars % 1000) AS u
        FROM documents),
      ranked AS (SELECT g, u,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY u) - 1 AS pos
        FROM base),
      sizes AS (SELECT g, COUNT(*)::BIGINT AS n,
          CAST(SUM(u) AS BIGINT) AS su
        FROM base GROUP BY g),
      gids AS (SELECT g, n, su,
          ROW_NUMBER() OVER (ORDER BY g) AS gid
        FROM sizes),
      slots AS (SELECT rk.g, gd.gid, gd.n, rr.r, rk.pos AS i,
          ${ScaleQueries.bucketSql("(gd.gid * 1000003 + rr.r * 2654435761 + rk.pos)")}
            % gd.n AS idx
        FROM ranked rk JOIN gids gd USING (g)
        CROSS JOIN (SELECT unnest(range(0, 200)) AS r) rr),
      picks AS (SELECT s.g, s.r, rk2.u
        FROM slots s JOIN ranked rk2 ON rk2.g = s.g AND rk2.pos = s.idx),
      sums AS (SELECT g, r, CAST(SUM(u) AS BIGINT) AS s
        FROM picks GROUP BY g, r),
      ord AS (SELECT g, s,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY s, r) AS rk
        FROM sums)
      SELECT gd.g AS lang, gd.n, 200::BIGINT AS m,
        ROUND(gd.su::DOUBLE / gd.n::DOUBLE, 6) AS mean,
        ROUND(lo.s::DOUBLE / gd.n::DOUBLE, 6) AS ci_lo,
        ROUND(hi.s::DOUBLE / gd.n::DOUBLE, 6) AS ci_hi
      FROM gids gd
      JOIN (SELECT g, s FROM ord WHERE rk = 5) lo USING (g)
      JOIN (SELECT g, s FROM ord WHERE rk = 196) hi USING (g)
      ORDER BY lang"""))

  /** Unigram-LM subword compression per language
    * ([[graft.scale.TextOps.unigramLmStats]]): corpus-derived piece
    * inventory (chars + top-200 bigrams + top-100 trigrams), integer
    * micro-unit piece costs, and an exact int64 Viterbi DP per
    * distinct word. The oracle replays the ENTIRE model — counts,
    * deterministic top-k cuts, and every DP step via an ordered
    * list_reduce over the same 3-term recurrence — so the hash-match
    * certifies each word's minimal segmentation cost.
    */
  private val q197 = GQuery(
    (s, d) => graft.scale.TextOps.unigramLmStats(
        T.documents(s, d), col("lang"), col("text"),
        topBigrams = 200, topTrigrams = 100)
      .orderBy(col("lang")),
    Some("""WITH lw AS (SELECT lang,
          unnest(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS w
        FROM documents),
      lwc AS (SELECT lang, w, COUNT(*)::BIGINT AS wn
        FROM lw GROUP BY lang, w),
      wc AS (SELECT w, CAST(SUM(wn) AS BIGINT) AS wn FROM lwc GROUP BY w),
      g1 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
        FROM (SELECT wn, unnest(list_transform(range(1, len(w) + 1),
            i -> substr(w, i::INT, 1))) AS piece
          FROM wc)
        GROUP BY piece),
      g2 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
        FROM (SELECT wn, unnest(list_transform(range(1, len(w)),
            i -> substr(w, i::INT, 2))) AS piece
          FROM wc WHERE len(w) >= 2)
        GROUP BY piece),
      g3 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
        FROM (SELECT wn, unnest(list_transform(range(1, len(w) - 1),
            i -> substr(w, i::INT, 3))) AS piece
          FROM wc WHERE len(w) >= 3)
        GROUP BY piece),
      nt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nt FROM g1),
      v2 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk FROM g2)
        WHERE rk <= 200),
      v3 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk FROM g3)
        WHERE rk <= 100),
      vocab AS (SELECT piece,
          CAST(round(1000000 * ln(nt.nt::DOUBLE)) AS BIGINT) -
            CAST(round(1000000 * ln(cnt::DOUBLE)) AS BIGINT) AS cost
        FROM (SELECT * FROM g1 UNION ALL SELECT * FROM v2
          UNION ALL SELECT * FROM v3) CROSS JOIN nt),
      pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS j FROM wc),
      pc AS (SELECT pos.w, pos.j, vv1.cost AS c1, vv2.cost AS c2,
          vv3.cost AS c3
        FROM pos
        LEFT JOIN vocab vv1 ON vv1.piece = substr(pos.w, pos.j::INT, 1)
        LEFT JOIN vocab vv2 ON pos.j >= 2
          AND vv2.piece = substr(pos.w, (pos.j - 1)::INT, 2)
        LEFT JOIN vocab vv3 ON pos.j >= 3
          AND vv3.piece = substr(pos.w, (pos.j - 2)::INT, 3)),
      wl AS (SELECT w, list([c1, c2, c3] ORDER BY j) AS st
        FROM pc GROUP BY w),
      dp AS (SELECT w, list_reduce(
          list_prepend([1000000000000000::BIGINT,
            1000000000000000::BIGINT, 0::BIGINT], st),
          (acc, s) -> [acc[2], acc[3],
            LEAST(COALESCE(acc[3] + s[1], 1000000000000000),
              COALESCE(acc[2] + s[2], 1000000000000000),
              COALESCE(acc[1] + s[3], 1000000000000000))])[3] AS cost
        FROM wl)
      SELECT lwc.lang, COUNT(*)::BIGINT AS n_words,
        CAST(SUM(lwc.wn) AS BIGINT) AS n_tokens,
        CAST(SUM(lwc.wn * len(lwc.w)) AS BIGINT) AS n_chars,
        CAST(SUM(lwc.wn * dp.cost) AS BIGINT) AS cost_units,
        ROUND(SUM(lwc.wn * dp.cost)::DOUBLE /
          (1000000.0 * SUM(lwc.wn * len(lwc.w))::DOUBLE), 6)
          AS nats_per_char
      FROM lwc JOIN dp ON lwc.w = dp.w
      GROUP BY lwc.lang ORDER BY lang"""))

  /** Apply-side unigram tokenization
    * ([[graft.scale.TextOps.unigramEncodeWords]]): q197's inventory
    * actually ENCODING the corpus — every distinct word's Viterbi
    * pieces, with the longest-piece-first tie-break replayed by the
    * oracle's backtracking fold. The hash-match certifies each piece
    * of each word, not just costs.
    */
  private val q198 = {
    // Backtracking runs as a RECURSIVE CTE, not a list_reduce lambda:
    // DuckDB 1.0 misbinds OUTER row columns referenced inside
    // list_reduce lambdas (sibling of the struct-accumulator defect —
    // costs came out right, encodings belonged to other rows). The
    // recursive walk is plain correlated SQL, one row per (word, step).
    def ok(k: Int) =
      s"bt.j >= $k AND bst.st[bt.j::INT][$k] IS NOT NULL AND " +
        s"bst.b[(bt.j - ${k - 1})::INT] + bst.st[bt.j::INT][$k] = " +
        s"bst.b[(bt.j + 1)::INT]"
    val kSel =
      s"(CASE WHEN ${ok(3)} THEN 3 WHEN ${ok(2)} THEN 2 ELSE 1 END)"
    GQuery(
      (s, d) => graft.scale.TextOps.unigramEncodeWords(
          T.documents(s, d), col("text"),
          topBigrams = 200, topTrigrams = 100)
        .orderBy(col("w")),
      Some(s"""WITH RECURSIVE toks AS (SELECT
            unnest(list_filter(string_split_regex(text, '\\s+'),
              x -> len(x) > 0)) AS w
          FROM documents),
        wc AS (SELECT w, COUNT(*)::BIGINT AS wn FROM toks GROUP BY w),
        g1 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
          FROM (SELECT wn, unnest(list_transform(range(1, len(w) + 1),
              i -> substr(w, i::INT, 1))) AS piece
            FROM wc)
          GROUP BY piece),
        g2 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
          FROM (SELECT wn, unnest(list_transform(range(1, len(w)),
              i -> substr(w, i::INT, 2))) AS piece
            FROM wc WHERE len(w) >= 2)
          GROUP BY piece),
        g3 AS (SELECT piece, CAST(SUM(wn) AS BIGINT) AS cnt
          FROM (SELECT wn, unnest(list_transform(range(1, len(w) - 1),
              i -> substr(w, i::INT, 3))) AS piece
            FROM wc WHERE len(w) >= 3)
          GROUP BY piece),
        nt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nt FROM g1),
        v2 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk FROM g2)
          WHERE rk <= 200),
        v3 AS (SELECT piece, cnt FROM (SELECT piece, cnt,
            ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS rk FROM g3)
          WHERE rk <= 100),
        vocab AS (SELECT piece,
            CAST(round(1000000 * ln(nt.nt::DOUBLE)) AS BIGINT) -
              CAST(round(1000000 * ln(cnt::DOUBLE)) AS BIGINT) AS cost
          FROM (SELECT * FROM g1 UNION ALL SELECT * FROM v2
            UNION ALL SELECT * FROM v3) CROSS JOIN nt),
        pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS j FROM wc),
        pc AS (SELECT pos.w, pos.j, vv1.cost AS c1, vv2.cost AS c2,
            vv3.cost AS c3
          FROM pos
          LEFT JOIN vocab vv1 ON vv1.piece = substr(pos.w, pos.j::INT, 1)
          LEFT JOIN vocab vv2 ON pos.j >= 2
            AND vv2.piece = substr(pos.w, (pos.j - 1)::INT, 2)
          LEFT JOIN vocab vv3 ON pos.j >= 3
            AND vv3.piece = substr(pos.w, (pos.j - 2)::INT, 3)),
        wl AS (SELECT w, list([c1, c2, c3] ORDER BY j) AS st
          FROM pc GROUP BY w),
        bst AS (SELECT w, st, list_reduce(
            list_prepend([0::BIGINT], st),
            (acc, s) -> list_append(acc, LEAST(
              COALESCE(acc[len(acc)] + s[1], 1000000000000000),
              CASE WHEN len(acc) >= 2
                THEN COALESCE(acc[len(acc) - 1] + s[2], 1000000000000000)
                ELSE 1000000000000000 END,
              CASE WHEN len(acc) >= 3
                THEN COALESCE(acc[len(acc) - 2] + s[3], 1000000000000000)
                ELSE 1000000000000000 END))) AS b
          FROM wl),
        walk AS (
          SELECT w, len(w)::BIGINT AS j, ''::VARCHAR AS encoded FROM bst
          UNION ALL
          SELECT bt.w, bt.j - $kSel,
            substr(bt.w, (bt.j - $kSel + 1)::INT, $kSel) ||
              CASE WHEN bt.encoded = '' THEN ''
                ELSE ' ' || bt.encoded END
          FROM walk bt JOIN bst ON bst.w = bt.w
          WHERE bt.j > 0)
        SELECT wc.w, wc.wn, walk.encoded,
          len(string_split(walk.encoded, ' '))::BIGINT AS n_pieces,
          bst.b[(len(wc.w) + 1)::INT] AS cost_u
        FROM wc JOIN walk ON wc.w = walk.w AND walk.j = 0
        JOIN bst ON bst.w = wc.w
        ORDER BY wc.w"""))
  }

  /** Perplexity gate with a calibrated cutoff — the canonical LM-based
    * quality filter, composed from two verified operators:
    * [[graft.scale.Lm.knBigramCrossEntropy]] grouped by doc_id gives
    * each held-out document's exact integer NLL (milli-nats-per-bigram
    * units via integer floor division), and
    * [[graft.scale.Eval.conformalThreshold]] turns the per-language
    * score distribution into a distribution-free 90%-coverage cutoff —
    * flagged = the ≤10% most-surprising docs per language. Single-token
    * documents have no bigrams and are excluded (the length gates own
    * those). The oracle replays the whole chain: KN model, per-doc NLL,
    * cumulative threshold walk, every flag.
    */
  private val q199 = GQuery(
    (s, d) => {
      val all = T.documents(s, d)
      val train = all.where(pmod(col("doc_id"), lit(2L)) === 0L)
      val ev = all.where(pmod(col("doc_id"), lit(2L)) === 1L)
      val den = lit(1000L) * col("n_bigrams")
      val perDoc = graft.scale.Lm.knBigramCrossEntropy(
          train, ev, col("doc_id"), col("text"))
        .select(col("source").cast("long").as("doc_id"),
          ((col("nll_units") - pmod(col("nll_units"), den)) / den)
            .cast("long").as("u"))
      val scored = perDoc.join(
        ev.select(col("doc_id"), col("lang")), "doc_id")
      val thr = graft.scale.Eval.conformalThreshold(
          scored, col("lang"), col("u"), alphaPct = 10)
        .select(col("group").as("lang"),
          col("threshold_unit"))
      scored.join(broadcast(thr), "lang")
        .select(col("doc_id"), col("lang"), col("u"),
          when(col("threshold_unit").isNotNull,
            col("u") > col("threshold_unit")).as("flagged"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH trt AS (SELECT
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
            AS t
        FROM documents WHERE doc_id % 2 = 0),
      bt AS (SELECT string_split(bigram, ' ')[1] AS w1,
          string_split(bigram, ' ')[2] AS w2
        FROM (SELECT unnest(list_transform(range(2, len(t) + 1),
            i -> t[i-1] || ' ' || t[i])) AS bigram
          FROM trt)),
      cb AS (SELECT w1, w2, COUNT(*)::BIGINT AS cb
        FROM bt GROUP BY w1, w2),
      heads AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1,
          COUNT(*)::BIGINT AS n1f
        FROM cb GROUP BY w1),
      tails AS (SELECT w2, COUNT(*)::BIGINT AS n1b FROM cb GROUP BY w2),
      consts AS (SELECT (SELECT COUNT(*)::BIGINT FROM cb) AS tt,
          (SELECT COUNT(DISTINCT tok)::BIGINT
            FROM (SELECT unnest(t) AS tok FROM trt)) AS v),
      evt AS (SELECT doc_id, lang,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
            AS t
        FROM documents WHERE doc_id % 2 = 1),
      be AS (SELECT doc_id, lang, string_split(bigram, ' ')[1] AS w1,
          string_split(bigram, ' ')[2] AS w2
        FROM (SELECT doc_id, lang,
            unnest(list_transform(range(2, len(t) + 1),
              i -> t[i-1] || ' ' || t[i])) AS bigram
          FROM evt)),
      bem AS (SELECT doc_id, lang, w1, w2, COUNT(*)::BIGINT AS m
        FROM be GROUP BY doc_id, lang, w1, w2),
      sc AS (SELECT bem.doc_id, bem.lang, bem.m,
          -CAST(round(1000000.0 * ln(
            CASE WHEN heads.c1 IS NOT NULL
              THEN GREATEST(COALESCE(cb.cb, 0)::DOUBLE - 0.75, 0.0) /
                  heads.c1::DOUBLE +
                (0.75 * heads.n1f::DOUBLE / heads.c1::DOUBLE) *
                  ((COALESCE(tails.n1b, 0) + 1)::DOUBLE /
                   (consts.tt + consts.v + 1)::DOUBLE)
              ELSE (COALESCE(tails.n1b, 0) + 1)::DOUBLE /
                (consts.tt + consts.v + 1)::DOUBLE
            END)) AS BIGINT) AS lpu
        FROM bem LEFT JOIN cb ON bem.w1 = cb.w1 AND bem.w2 = cb.w2
        LEFT JOIN heads ON bem.w1 = heads.w1
        LEFT JOIN tails ON bem.w2 = tails.w2
        CROSS JOIN consts),
      pd AS (SELECT doc_id, lang, CAST(SUM(m) AS BIGINT) AS nb,
          CAST(SUM(m * lpu) AS BIGINT) AS nll
        FROM sc GROUP BY doc_id, lang),
      ud AS (SELECT doc_id, lang, nll // (1000 * nb) AS u FROM pd),
      per AS (SELECT lang, u, COUNT(*)::BIGINT AS c
        FROM ud GROUP BY lang, u),
      cum AS (SELECT lang, u, SUM(c) OVER (PARTITION BY lang ORDER BY u
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        FROM per),
      tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n
        FROM per GROUP BY lang),
      tk AS (SELECT lang, n, ((n + 1) * 90 + 99) // 100 AS k FROM tot),
      hit AS (SELECT cum.lang, cum.u,
          ROW_NUMBER() OVER (PARTITION BY cum.lang ORDER BY cum.u) AS rn
        FROM cum JOIN tk ON cum.lang = tk.lang WHERE cum.cum >= tk.k),
      h1 AS (SELECT lang, u AS thr FROM hit WHERE rn = 1)
      SELECT ud.doc_id, ud.lang, ud.u,
        CASE WHEN tk.k <= tk.n THEN ud.u > h1.thr END AS flagged
      FROM ud JOIN tk ON ud.lang = tk.lang
      LEFT JOIN h1 ON ud.lang = h1.lang
      ORDER BY ud.doc_id"""))

  val all: Map[String, GQuery] = Map(
    "q171_roc_auc" -> q171,
    "q172_ks_drift" -> q172,
    "q173_ranking_eval" -> q173,
    "q174_cohen_kappa" -> q174,
    "q175_chi2_terms" -> q175,
    "q176_js_divergence" -> q176,
    "q177_naive_bayes" -> q177,
    "q178_pr_curve" -> q178,
    "q179_calibration_error" -> q179,
    "q180_mcnemar" -> q180,
    "q181_fairness_audit" -> q181,
    "q182_kn_cross_entropy" -> q182,
    "q184_woe_iv" -> q184,
    "q185_loo_target_encode" -> q185,
    "q186_nb_heldout" -> q186,
    "q187_lift_table" -> q187,
    "q188_mutual_info_terms" -> q188,
    "q189_feature_hash" -> q189,
    "q190_psi_drift" -> q190,
    "q191_cuped" -> q191,
    "q193_conformal_threshold" -> q193,
    "q194_ab_test" -> q194,
    "q196_bootstrap_ci" -> q196,
    "q197_unigram_lm" -> q197,
    "q198_unigram_encode" -> q198,
    "q199_ppl_gate" -> q199,
    "q219_langid_ngram" -> q219,
    "q225_langid_segment" -> q225)
}
