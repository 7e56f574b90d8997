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

  val all: Map[String, GQuery] = Map(
    "q171_roc_auc" -> q171,
    "q172_ks_drift" -> q172)
}
