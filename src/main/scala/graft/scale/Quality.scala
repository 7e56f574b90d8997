package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a production
  * table passes before downstream jobs consume it (the Deequ/dbt-test
  * shape, engine-native).
  *
  * All ROW-LEVEL checks evaluate in ONE aggregation pass over the table:
  * each check is a boolean column, violations are `sum(violated)` — so 20
  * expectations cost one scan, not 20 (the q70 single-pass-profile rule
  * applied to validation). Key uniqueness needs its own distinct
  * aggregate (duplicate detection is not a per-row predicate); it runs as
  * a second narrow pass over the key column only.
  *
  * Output is a long-format report (one row per check) so the gate is
  * joinable/alertable: `check`, `n_rows`, `n_violations`, `pass`.
  */
object Quality {

  /** Evaluate `checks` (name → per-row PASS predicate; null counts as a
    * violation) plus optional `uniqueKeys` (each must be duplicate-free).
    */
  def expect(df: DataFrame, checks: Seq[(String, org.apache.spark.sql.Column)],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no expectations given")
    val spark = df.sparkSession
    val rowReport: Option[DataFrame] = if (checks.nonEmpty) {
      val aggs = count(lit(1)).as("__n") +:
        checks.map { case (name, pred) =>
          sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single aggregate row to long format — explode of
      // literal structs, no extra pass (the q38 labSummary shape)
      val entries = checks.map { case (name, _) =>
        struct(lit(name).as("check"), col(s"__v_$name").as("n_violations"))
      }
      Some(one.select(col("__n"), explode(array(entries: _*)).as("e"))
        .select(col("e.check").as("check"), col("__n").as("n_rows"),
          col("e.n_violations").as("n_violations")))
    } else None
    val keyReports = uniqueKeys.map { k =>
      df.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count_distinct(col(k))).as("n_violations"))
        .select(lit(s"unique:$k").as("check"), col("n_rows"),
          col("n_violations"))
    }
    val all = (rowReport.toSeq ++ keyReports).reduce(_ unionByName _)
    all.withColumn("pass", col("n_violations") === 0L)
  }
}
