package graft.suite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.queries.Reports
import graft.wellness.Wellness

/** The reference's report layer (Athena_queries_for_reports.sql) and wellness
  * layer (mrp_website.py) exercised end-to-end against the oracle, mapped
  * onto the testdata: events ~ observation (user_id ~ patient_id,
  * event_type ~ code_display, value ~ value_quantity, ts ~
  * effective_datetime); orders plays the qualitative-text observation for
  * the T2D report.
  */
object ReportQueries {

  /** Full CVD report pipeline (filter → latest-per-key window → MAX-CASE
    * pivot → CASE banding → overall OR-of-thresholds), reference thresholds
    * verbatim. SURVEY §2 rows W1, A2, P8, P9.
    */
  private val q18 = GQuery(
    (s, d) => {
      val obs = T.events(s, d)
      Reports.cvdReport(obs, "user_id", "event_type", "value", "ts", "event_id",
        hdl = "view", ldl = "click", trig = "purchase", totalChol = "error")
        .orderBy(col("patient"))
    },
    Some("""WITH observations AS (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase', 'error')),
      pvt AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'view' THEN TRY_CAST(value AS DOUBLE) END) AS hdl,
          MAX(CASE WHEN event_type = 'click' THEN TRY_CAST(value AS DOUBLE) END) AS ldl,
          MAX(CASE WHEN event_type = 'purchase' THEN TRY_CAST(value AS DOUBLE) END) AS trig,
          MAX(CASE WHEN event_type = 'error' THEN TRY_CAST(value AS DOUBLE) END) AS total_chol
        FROM observations WHERE rn = 1 GROUP BY user_id)
      SELECT user_id AS patient, hdl,
        CASE WHEN hdl IS NULL THEN 'n/a' WHEN hdl >= 60 THEN 'Protective'
          WHEN hdl BETWEEN 40 AND 59 THEN 'Normal' WHEN hdl < 40 THEN 'Low' END AS hdl_status,
        ldl,
        CASE WHEN ldl IS NULL THEN 'n/a' WHEN ldl >= 160 THEN 'High'
          WHEN ldl BETWEEN 130 AND 159 THEN 'Borderline'
          WHEN ldl BETWEEN 100 AND 129 THEN 'Near optimal'
          WHEN ldl < 100 THEN 'Optimal' END AS ldl_status,
        trig,
        CASE WHEN trig IS NULL THEN 'n/a' WHEN trig >= 200 THEN 'High'
          WHEN trig BETWEEN 150 AND 199 THEN 'Borderline'
          WHEN trig < 150 THEN 'Normal' END AS triglycerides_status,
        total_chol,
        CASE WHEN total_chol IS NULL THEN 'n/a' WHEN total_chol >= 240 THEN 'High'
          WHEN total_chol BETWEEN 200 AND 239 THEN 'Borderline'
          WHEN total_chol < 200 THEN 'Desirable' END AS total_chol_status,
        CASE WHEN ldl >= 130 OR trig >= 150 OR hdl < 40 OR total_chol >= 240 THEN 'At risk'
          WHEN hdl IS NULL AND ldl IS NULL AND trig IS NULL AND total_chol IS NULL
            THEN 'Insufficient data'
          ELSE 'Likely normal' END AS overall_cvd_risk
      FROM pvt ORDER BY patient"""))

  /** T2D report with the qualitative MAX-over-LOWER(TRIM(text)) branch
    * (Athena_queries_for_reports.sql:106-108), mapped onto orders:
    * o_custkey ~ patient, o_orderpriority ~ code_display, o_totalprice ~
    * numeric value, o_orderstatus ~ value_string. Thresholds rescaled to the
    * o_totalprice range; structure and CASE priorities identical.
    */
  private val q19 = GQuery(
    (s, d) => {
      val obs = T.orders(s, d)
      Reports.t2dReport(obs, "o_custkey", "o_orderpriority",
        numCol = "o_totalprice", txtCol = "o_orderstatus",
        timeCol = "o_orderdate", tiebreak = "o_orderkey",
        a1cKey = "1-URGENT", glucoseKey = "2-HIGH",
        urineKeys = Seq("3-MEDIUM", "5-LOW"),
        a1cDiab = 300000, a1cPre = 150000,
        gluDiab = 300000, gluPreLo = 150000, gluPreHi = 299999,
        gluNormLo = 50000, gluNormHi = 149999,
        posTxt = Seq("p"), traceTxt = Seq("o"), negTxt = Seq("f"))
        .orderBy(col("patient"))
    },
    Some("""WITH observations AS (
        SELECT o_custkey, o_orderpriority, o_totalprice, o_orderstatus,
          ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '5-LOW')),
      pvt AS (
        SELECT o_custkey,
          MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN TRY_CAST(o_totalprice AS DOUBLE) END) AS a1c,
          MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN TRY_CAST(o_totalprice AS DOUBLE) END) AS glucose_blood,
          MAX(CASE WHEN o_orderpriority IN ('3-MEDIUM', '5-LOW')
            THEN LOWER(TRIM(o_orderstatus)) END) AS glucose_urine_txt
        FROM observations WHERE rn = 1 GROUP BY o_custkey)
      SELECT o_custkey AS patient, a1c,
        CASE WHEN a1c IS NULL THEN 'n/a' WHEN a1c >= 300000 THEN 'Diabetes'
          WHEN a1c >= 150000 THEN 'Prediabetes' ELSE 'Normal' END AS a1c_status,
        glucose_blood,
        CASE WHEN glucose_blood IS NULL THEN 'n/a'
          WHEN glucose_blood >= 300000 THEN 'Diabetes'
          WHEN glucose_blood BETWEEN 150000 AND 299999 THEN 'Prediabetes'
          WHEN glucose_blood BETWEEN 50000 AND 149999 THEN 'Normal'
          WHEN glucose_blood < 50000 THEN 'Low' END AS glucose_blood_status,
        glucose_urine_txt,
        CASE WHEN glucose_urine_txt IS NULL THEN 'n/a'
          WHEN glucose_urine_txt IN ('p') THEN 'Abnormal'
          WHEN glucose_urine_txt IN ('o') THEN 'Borderline'
          WHEN glucose_urine_txt IN ('f') THEN 'Normal'
          ELSE 'n/a' END AS glucose_urine_status,
        CASE WHEN a1c >= 300000 OR glucose_blood >= 300000
            OR glucose_urine_txt IN ('p') THEN 'Diabetes likely (lab criteria met)'
          WHEN (a1c BETWEEN 150000 AND 299999.9) OR (glucose_blood BETWEEN 150000 AND 299999)
            OR glucose_urine_txt IN ('o') THEN 'Prediabetes / Elevated risk'
          WHEN a1c IS NULL AND glucose_blood IS NULL AND glucose_urine_txt IS NULL
            THEN 'Insufficient data'
          ELSE 'Normal' END AS overall_t2d_risk
      FROM pvt ORDER BY patient"""))

  /** Wellness scoring (mrp_website.py L4a) end-to-end: latest-per-key pivot
    * to a wide analyte row, penalty bins (F10), weighted renormalized
    * subscores + wellness + confidence (A5). Analyte mapping: click→LDL,
    * view→HDL, purchase→Triglycerides, error→TotalChol, signup→GlucoseBlood;
    * the absent analytes exercise the renormalization path. All arithmetic
    * is written in the same order on both sides, so doubles are
    * bit-identical before the final rounding.
    */
  private val q20 = GQuery(
    (s, d) => {
      val piv0 = Reports.pivotLatest(T.events(s, d), "user_id", "event_type",
        "value", "ts", "event_id",
        Seq("ldl" -> "click", "hdl" -> "view", "trig" -> "purchase",
          "total_chol" -> "error", "glucose_blood" -> "signup"))
      val analyteCol = Map(
        "LDL" -> "ldl", "HDL" -> "hdl", "Triglycerides" -> "trig",
        "TotalChol" -> "total_chol", "GlucoseBlood" -> "glucose_blood")
      val absent = Wellness.Refs.keys.toSeq.sorted.filterNot(analyteCol.contains)
      val piv = absent.foldLeft(piv0)((acc, a) =>
        acc.withColumn(s"abs_${a.toLowerCase}", lit(null).cast("double")))
      val scored = Wellness.scoreWide(piv,
        name => analyteCol.getOrElse(name, s"abs_${name.toLowerCase}"))
      scored.select(
        col("user_id"),
        round(col("sub_cardiovascular"), 6).as("sub_cardio"),
        round(col("sub_prediabetes"), 6).as("sub_prediabetes"),
        round(col("wellness"), 6).as("wellness"),
        round(col("confidence"), 6).as("confidence"))
        .orderBy(col("user_id"))
    },
    Some(WellnessOracle.sql))

  /** F11/F12 lab summary (test.py:37-116,166-193,296-321): latest-per-key
    * pivot to `*_latest` analyte columns, then LabInfo.labSummary unpivots
    * to one row per (patient, analyte) with the 5-way ±10%/+20% banding,
    * emoji decoration and severity rank. The analyte mapping picks ranges
    * that exercise all 5 bands against the events value distribution
    * (glucose 70-140 straddles the data; hemoglobin 12-17 mostly High;
    * hdl low-side bands; missing pivots hit Unknown).
    */
  private val q38 = GQuery(
    (s, d) => {
      val piv = Reports.pivotLatest(T.events(s, d), "user_id", "event_type",
        "value", "ts", "event_id",
        Seq("glucose_latest" -> "click", "hdl_latest" -> "view",
          "triglycerides_latest" -> "purchase", "hemoglobin_latest" -> "error",
          "creatinine_latest" -> "signup"))
      graft.wellness.LabInfo.labSummary(piv, "user_id")
        .withColumn("severity_rank", col("severity_rank").cast("long"))
        .orderBy(col("user_id"), col("lab_key"))
    },
    Some("""WITH latest AS (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase', 'error', 'signup')),
      pvt AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'click' THEN TRY_CAST(value AS DOUBLE) END) AS glucose_latest,
          MAX(CASE WHEN event_type = 'view' THEN TRY_CAST(value AS DOUBLE) END) AS hdl_latest,
          MAX(CASE WHEN event_type = 'purchase' THEN TRY_CAST(value AS DOUBLE) END) AS triglycerides_latest,
          MAX(CASE WHEN event_type = 'error' THEN TRY_CAST(value AS DOUBLE) END) AS hemoglobin_latest,
          MAX(CASE WHEN event_type = 'signup' THEN TRY_CAST(value AS DOUBLE) END) AS creatinine_latest
        FROM latest WHERE rn = 1 GROUP BY user_id),
      labs(lab_key, lab, unit, ref_low, ref_high) AS (VALUES
        ('creatinine_latest', 'Creatinine', 'mg/dL', 0.4, 1.3),
        ('glucose_latest', 'Glucose', 'mg/dL', 70.0, 140.0),
        ('hdl_latest', 'HDL cholesterol', 'mg/dL', 40.0, 999.0),
        ('triglycerides_latest', 'Triglycerides', 'mg/dL', 0.0, 150.0),
        ('hemoglobin_latest', 'Hemoglobin', 'g/dL', 12.0, 17.0)),
      u AS (
        SELECT user_id, lab_key, lab, unit,
          (CASE lab_key
            WHEN 'creatinine_latest' THEN creatinine_latest
            WHEN 'glucose_latest' THEN glucose_latest
            WHEN 'hdl_latest' THEN hdl_latest
            WHEN 'triglycerides_latest' THEN triglycerides_latest
            WHEN 'hemoglobin_latest' THEN hemoglobin_latest END) AS value,
          -- cast BEFORE the multiplier math: DECIMAL literals would compute
          -- band edges exactly (0.4*0.9 = 0.36) where Spark computes them in
          -- IEEE double (0.36000000000000004) — boundary values would band
          -- differently across engines
          CAST(ref_low AS DOUBLE) AS ref_low, CAST(ref_high AS DOUBLE) AS ref_high
        FROM pvt CROSS JOIN labs),
      banded AS (
        SELECT user_id, lab_key, lab, unit, value, ref_low, ref_high,
          (CASE WHEN value IS NULL THEN 'Unknown'
            WHEN value < ref_low * 0.9 THEN 'Low'
            WHEN value < ref_low THEN 'Borderline low'
            WHEN value <= ref_high THEN 'In range'
            WHEN value <= ref_high * 1.2 THEN 'Borderline high'
            ELSE 'High' END) AS status
        FROM u)
      SELECT user_id, lab_key, lab, unit, value, ref_low, ref_high, status,
        (CASE WHEN status = 'In range' THEN '🟢'
          WHEN status IN ('Borderline high', 'Borderline low') THEN '🟡'
          WHEN status IN ('High', 'Low') THEN '🔴'
          ELSE '⚪️' END) AS emoji,
        CAST(CASE WHEN status IN ('High', 'Low') THEN 0
          WHEN status IN ('Borderline high', 'Borderline low') THEN 1
          WHEN status = 'In range' THEN 2
          ELSE 3 END AS BIGINT) AS severity_rank
      FROM banded ORDER BY user_id, lab_key"""))

  def all: Map[String, GQuery] = Map(
    "q18_cvd_report" -> q18,
    "q19_t2d_report" -> q19,
    "q20_wellness_score" -> q20,
    "q38_lab_summary" -> q38,
  )
}

/** DuckDB mirror of the wellness arithmetic — kept separate because it is
  * mechanically derived from Wellness.Refs / DiseaseWeights /
  * WellnessWeights with the exact same operation order.
  */
private object WellnessOracle {
  // penalty CASE for an analyte column, mirroring Wellness.penalty
  private def pen(c: String, edges: Seq[Double], ps: Seq[Int], tail: Int): String = {
    val arms = edges.zip(ps).map { case (e, p) => s"WHEN $c < $e THEN $p" }.mkString(" ")
    s"(CASE WHEN $c IS NULL THEN NULL $arms ELSE $tail END)"
  }

  private def subSql(analytes: Seq[(String, Double, String)]): String = {
    // analytes: (refsKey, weight, sqlCol); mirrors Wellness.subscore order
    val weighted = analytes.map { case (k, w, c) =>
      val b = Wellness.Refs(k)
      s"COALESCE(CAST(${pen(c, b.edges, b.penalties, b.tailPenalty)} AS DOUBLE) * $w, 0.0)"
    }.mkString(" + ")
    val mass = analytes.map { case (_, w, c) =>
      s"(CASE WHEN $c IS NOT NULL THEN $w ELSE 0.0 END)"
    }.mkString(" + ")
    s"(CASE WHEN ($mass) > 0.0 THEN GREATEST(0.0, LEAST(100.0, 100.0 - ($weighted) * 100.0 / 3.0)) END)"
  }

  val sql: String = {
    val subCardio = subSql(Seq(
      ("LDL", 0.40, "ldl"), ("HDL", 0.20, "hdl"),
      ("Triglycerides", 0.20, "trig"), ("TotalChol", 0.20, "total_chol")))
    val subPre = subSql(Seq(("A1c", 0.60, "a1c"), ("GlucoseBlood", 0.40, "glucose_blood")))
    // CKD / Anemia / Liver analytes are all absent in the mapping -> NULL
    val wellnessExpr =
      s"""(CASE WHEN (CASE WHEN sub_cardio IS NOT NULL THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN sub_pre IS NOT NULL THEN 0.25 ELSE 0.0 END) > 0.0
        THEN (COALESCE(sub_cardio * 0.25, 0.0) + COALESCE(sub_pre * 0.25, 0.0) + 0.0 + 0.0 + 0.0)
          / ((CASE WHEN sub_cardio IS NOT NULL THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN sub_pre IS NOT NULL THEN 0.25 ELSE 0.0 END)) END)"""
    val massExpr =
      s"""((CASE WHEN sub_cardio IS NOT NULL THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN sub_pre IS NOT NULL THEN 0.25 ELSE 0.0 END))"""
    s"""WITH latest AS (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase', 'error', 'signup')),
      pvt AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'click' THEN TRY_CAST(value AS DOUBLE) END) AS ldl,
          MAX(CASE WHEN event_type = 'view' THEN TRY_CAST(value AS DOUBLE) END) AS hdl,
          MAX(CASE WHEN event_type = 'purchase' THEN TRY_CAST(value AS DOUBLE) END) AS trig,
          MAX(CASE WHEN event_type = 'error' THEN TRY_CAST(value AS DOUBLE) END) AS total_chol,
          MAX(CASE WHEN event_type = 'signup' THEN TRY_CAST(value AS DOUBLE) END) AS glucose_blood,
          CAST(NULL AS DOUBLE) AS a1c
        FROM latest WHERE rn = 1 GROUP BY user_id),
      subs AS (
        SELECT user_id, $subCardio AS sub_cardio, $subPre AS sub_pre FROM pvt)
      SELECT user_id, ROUND(sub_cardio, 6) AS sub_cardio,
        ROUND(sub_pre, 6) AS sub_prediabetes,
        ROUND($wellnessExpr, 6) AS wellness,
        ROUND($massExpr, 6) AS confidence
      FROM subs ORDER BY user_id"""
  }
}
