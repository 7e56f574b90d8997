package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.wellness.Wellness

/** S5: the wide lab-panel CSV source (mrp_website.py:255-287) — columns may
  * include `date`, `patient_id`, and any subset of the 15 analytes; missing
  * `date` is synthesized as a daily sequence ending at the reference date;
  * missing `patient_id` collapses to a single "Patient".
  */
object LabPanel {

  val analytes: Seq[String] = Wellness.Refs.keys.toSeq.sorted

  /** Read + normalize: every analyte column present is cast double; absent
    * analytes become typed null columns so downstream scoring is uniform.
    */
  def read(spark: SparkSession, path: String,
      today: String = "2025-01-01"): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    normalize(raw, today)
  }

  def normalize(raw: DataFrame, today: String): DataFrame = {
    val withDate =
      if (raw.columns.contains("date"))
        raw.withColumn("date", to_date(col("date")))
      else {
        // synthesized daily grid ending today (mrp_website.py:287): needs a
        // stable contiguous per-row index. zipWithIndex assigns it from
        // per-partition offsets — no global single-partition window, so the
        // path stays distributed even if a "panel" arrives at warehouse
        // scale. (Index order = partition order, matching the file order
        // for file sources, which is the reference's implicit row order.)
        val n = raw.count()
        val schema = raw.schema.add("__rn", org.apache.spark.sql.types.LongType)
        val indexed = raw.sparkSession.createDataFrame(
          raw.rdd.zipWithIndex().map { case (row, i) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1)) },
          schema)
        indexed
          .withColumn("date",
            date_add(to_date(lit(today)), (col("__rn") - n).cast("int")))
          .drop("__rn")
      }
    val withPatient =
      if (withDate.columns.contains("patient_id")) withDate
      else withDate.withColumn("patient_id", lit("Patient"))
    analytes.foldLeft(withPatient) { (acc, a) =>
      if (acc.columns.contains(a)) acc.withColumn(a, col(a).cast("double"))
      else acc.withColumn(a, lit(null).cast("double"))
    }
  }

  /** A3: confidence by recency/coverage (confidence_for_disease,
    * mrp_website.py:415-423): among a disease's analytes, count how many
    * have any non-null value in the patient's last 4 records →
    * High (>=2) / Medium (1) / Low (0).
    */
  def diseaseConfidence(panel: DataFrame, disease: String): DataFrame = {
    val cols = Wellness.DiseaseWeights(disease).map(_._1)
    val w = Window.partitionBy(col("patient_id")).orderBy(col("date").desc)
    val recent = panel.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 4)
    val present = cols.map(c =>
      when(max(when(col(c).isNotNull, 1).otherwise(0)) === 1, 1).otherwise(0))
      .reduce(_ + _)
    recent.groupBy(col("patient_id"))
      .agg(present.as("n_present"))
      .withColumn("confidence",
        when(col("n_present") >= 2, "High")
          .when(col("n_present") === 1, "Medium")
          .otherwise("Low"))
      .select(col("patient_id"), col("confidence"))
  }

  /** Latest row per patient (pdf.iloc[-1], mrp_website.py:299) + wellness
    * scoring over it — the dashboard's headline numbers.
    */
  def latestScored(panel: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("patient_id")).orderBy(col("date").desc)
    val latest = panel.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    Wellness.scoreWide(latest, identity)
  }
}
