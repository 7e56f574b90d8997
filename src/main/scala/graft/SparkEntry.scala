package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.suite.{AnalyticsQueries, AugmentQueries, AuxQueries, CdcQueries, CoreQueries, CurationQueries, EvalQueries, ExtendedQueries, IngestQueries, MlQueries, MultimodalQueries, PipelineQueries, ReportQueries, ScaleQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full verifiable operator inventory (SURVEY.md §2 mapped
  * onto the driver testdata); `oracleSql` holds the DuckDB mirror for every
  * SQL-expressible entry (hash-based MinHash/SimHash entries are rows-only).
  */
object SparkEntry {

  /** Host coupling: building the registry resolves MlQueries' XGB model
    * artifact (default `/root/reference/xgb_ckd_model.json`, overridable via
    * env `GRAFT_XGB_CKD_MODEL`) and IngestQueries' checked-in fixtures under
    * `/root/repo/src/test/resources/fixtures/`. Lazy so merely linking
    * SparkEntry never touches the filesystem; first use of
    * entry/queries/oracleSql does.
    */
  private lazy val registry = Seq(
    CoreQueries.all, WindowQueries.all, ReportQueries.all, ScaleQueries.all,
    ExtendedQueries.all, MlQueries.all, IngestQueries.all, CurationQueries.all,
    MultimodalQueries.all, CdcQueries.all, AuxQueries.all,
    AnalyticsQueries.all, PipelineQueries.all, AugmentQueries.all,
    EvalQueries.all)
    .reduce(_ ++ _)

  /** Flagship: the reference's CVD clinical report pipeline
    * (Athena_queries_for_reports.sql:3-76) — filter → latest-per-key window
    * → MAX-CASE pivot → CASE banding — on sf0.001. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    registry("q18_cvd_report").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
