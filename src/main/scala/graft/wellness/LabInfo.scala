package graft.wellness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-analyte reference range (SURVEY §2 F11). Data from the reference's
  * LAB_INFO constant (test.py:37-116) — 13 analytes keyed by the feature
  * table's `*_latest` column names.
  */
final case class LabRef(key: String, name: String, unit: String,
    low: Double, high: Double)

/** The reference's lab-status semantics (test.py:37-116,166-193): 5-way
  * banding against per-analyte (low, high) with ±10%/+20% borderline
  * multipliers, plus the emoji decoration (F12) and the severity ranking
  * used to sort "labs that need attention" (test.py:528-535).
  *
  * Everything is a pure column expression over broadcast-literal metadata —
  * banding 13 analytes for a billion patients is a narrow codegen'd map
  * with zero shuffle and no metadata join.
  */
object LabInfo {

  /** test.py:37-116 verbatim (keys, display names, units, low, high). */
  val all: Seq[LabRef] = Seq(
    LabRef("creatinine_latest", "Creatinine", "mg/dL", 0.4, 1.3),
    LabRef("egfr_latest", "eGFR", "mL/min/1.73m²", 60, 999),
    LabRef("glucose_latest", "Glucose", "mg/dL", 70, 140),
    LabRef("hba1c_latest", "HbA1c", "%", 4.0, 5.6),
    LabRef("ldl_latest", "LDL cholesterol", "mg/dL", 0, 130),
    LabRef("hdl_latest", "HDL cholesterol", "mg/dL", 40, 999),
    LabRef("triglycerides_latest", "Triglycerides", "mg/dL", 0, 150),
    LabRef("hemoglobin_latest", "Hemoglobin", "g/dL", 12, 17),
    LabRef("hematocrit_latest", "Hematocrit", "%", 36, 50),
    LabRef("bun_latest", "BUN", "mg/dL", 7, 25),
    LabRef("albumin_latest", "Albumin", "g/dL", 3.5, 5.0),
    LabRef("ast_latest", "AST", "U/L", 0, 40),
    LabRef("alt_latest", "ALT", "U/L", 0, 40))

  val byKey: Map[String, LabRef] = all.map(r => r.key -> r).toMap

  /** status_from_lab_value (test.py:166-183): first-match CASE chain.
    * `value < low·0.9` → Low; `< low` → Borderline low; `<= high` →
    * In range; `<= high·1.2` → Borderline high; else High; null → Unknown.
    * The multiplier products are computed in IEEE double exactly as
    * Python/DuckDB compute them, so band edges agree across engines.
    */
  def statusFromLabValue(value: Column, low: Double, high: Double): Column =
    when(value.isNull, "Unknown")
      .when(value < low * 0.9, "Low")
      .when(value < low, "Borderline low")
      .when(value <= high, "In range")
      .when(value <= high * 1.2, "Borderline high")
      .otherwise("High")

  /** Data-driven variant for when the reference ranges live in a table
    * (joined, not literal) — same band semantics with column bounds.
    */
  def statusFromLabValue(value: Column, low: Column, high: Column): Column =
    when(value.isNull, "Unknown")
      .when(value < low * 0.9, "Low")
      .when(value < low, "Borderline low")
      .when(value <= high, "In range")
      .when(value <= high * 1.2, "Borderline high")
      .otherwise("High")

  /** status_emoji (test.py:186-193): green in-range, yellow borderline,
    * red out-of-range, white unknown. Match order mirrors the reference
    * (startswith / contains / exact-set).
    */
  def statusEmoji(status: Column): Column =
    when(status.startsWith("In range"), "🟢")
      .when(status.contains("Borderline"), "🟡")
      .when(status.isin("High", "Low"), "🔴")
      .otherwise("⚪️")

  /** Severity rank for "labs that need attention" (test.py:528-535):
    * High/Low 0, Borderline 1, In range 2, Unknown/other 3.
    */
  def severityRank(status: Column): Column =
    when(status.isin("High", "Low"), 0)
      .when(status.isin("Borderline high", "Borderline low"), 1)
      .when(status === "In range", 2)
      .otherwise(3)

  /** build_lab_summary (test.py:296-321) as a distributed operator: the
    * reference loops over one patient's pandas Series; here every patient
    * row of a wide feature table unpivots to one row per known analyte
    * column with value, reference range, status, emoji and severity.
    * Pure explode-of-literal-structs projection — no shuffle, no join.
    */
  def labSummary(features: DataFrame, idCol: String): DataFrame = {
    val present = all.filter(r => features.columns.contains(r.key))
    require(present.nonEmpty, "no LAB_INFO columns present in the feature table")
    val entries = present.map { r =>
      val v = col(r.key).cast("double")
      val status = statusFromLabValue(v, r.low, r.high)
      struct(
        lit(r.key).as("lab_key"), lit(r.name).as("lab"),
        lit(r.unit).as("unit"), v.as("value"),
        lit(r.low).as("ref_low"), lit(r.high).as("ref_high"),
        status.as("status"),
        statusEmoji(status).as("emoji"),
        severityRank(status).as("severity_rank"))
    }
    features
      .select(col(idCol), explode(array(entries: _*)).as("e"))
      .select(col(idCol), col("e.*"))
  }
}
