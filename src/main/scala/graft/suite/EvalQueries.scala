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

  val all: Map[String, GQuery] = Map(
    "q171_roc_auc" -> q171,
    "q172_ks_drift" -> q172,
    "q173_ranking_eval" -> q173)
}
