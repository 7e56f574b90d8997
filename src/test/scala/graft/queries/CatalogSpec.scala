package graft.queries

import graft.SparkSpec

/** E2 parity: the report SQL (Presto dialect) runs unchanged through
  * spark.sql over the curated tables, and the DataFrame builders produce
  * identical results — one semantics, two front-ends.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private val HDL = "Cholesterol in HDL [Mass/volume] in Serum or Plasma"
  private val LDL = "Low Density Lipoprotein Cholesterol"
  private val URI = "Glucose [Presence] in Urine by Test strip"

  private lazy val obs = Seq(
    ("o1", "p1", HDL, Some(35.0), None: Option[String], "2023-06-01T00:00:00Z"),
    ("o2", "p1", LDL, Some(150.0), None: Option[String], "2023-06-01T00:00:00Z"),
    ("o3", "p1", LDL, Some(90.0), None: Option[String], "2022-06-01T00:00:00Z"),
    ("o4", "p2", URI, None, Some("Trace "), "2023-06-01T00:00:00Z"),
    ("o5", "p2", "Glucose [Mass/volume] in Blood", Some(110.0), None, "2023-06-01T00:00:00Z"))
    .toDF("observation_id", "patient_id", "code_display", "value_quantity",
      "value_string", "effective_datetime")

  test("reference report SQL runs verbatim through spark.sql") {
    Catalog.registerViews(Map("observation" -> obs))
    val cvd = spark.sql(Catalog.cvdReportSql).collect()
      .map(r => r.getAs[String]("patient") -> r).toMap
    assert(cvd("p1").getAs[String]("hdl_status") == "Low")
    assert(cvd("p1").getAs[Double]("ldl") == 150.0) // rn=1 beats older 90
    assert(cvd("p1").getAs[String]("overall_cvd_risk") == "At risk")

    val t2d = spark.sql(Catalog.t2dReportSql).collect()
      .map(r => r.getAs[String]("patient") -> r).toMap
    assert(t2d("p2").getAs[String]("glucose_urine_txt") == "trace")
    assert(t2d("p2").getAs[String]("overall_t2d_risk") == "Prediabetes / Elevated risk")
  }

  test("SQL and DataFrame front-ends agree row-for-row") {
    Catalog.registerViews(Map("observation" -> obs))
    val viaSql = spark.sql(Catalog.cvdReportSql)
    val viaDf = Reports.cvdReport(obs, "patient_id", "code_display",
      "value_quantity", "effective_datetime", "observation_id",
      HDL, LDL, "Triglycerides", "Cholesterol [Mass/volume] in Serum or Plasma")
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("ad-hoc count/value queries (AWS_Athena_queries.sql:79-93)") {
    Catalog.registerViews(Map("observation" -> obs))
    val n = spark.sql(Catalog.adhocCountSql(HDL, 70)).collect().head.getLong(0)
    assert(n == 1)
    val vs = spark.sql(Catalog.adhocValuesSql(LDL, 2000)).collect().map(_.getDouble(0))
    assert(vs.sorted.toSeq == Seq(90.0, 150.0))
  }

  test("external table DDL registers parquet-backed tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cat").toString
    obs.write.mode("overwrite").parquet(s"$tmp/observation")
    Seq("patient", "encounter", "condition").foreach { t =>
      obs.limit(0).write.mode("overwrite").parquet(s"$tmp/$t")
    }
    Catalog.createExternalTables(spark, "healthcare_curated", tmp)
    assert(spark.sql("SELECT COUNT(*) FROM healthcare_curated.observation")
      .collect().head.getLong(0) == 5)
  }
}
