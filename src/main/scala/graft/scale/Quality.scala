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

  /** Referential-integrity / coverage audit for one FK relation: how
    * many child rows point at no parent (orphans), and how many carry a
    * null FK (their own category — a null never "matches" and is NOT
    * counted as an orphan). Run child→parent for integrity ("no order
    * without a customer") and parent→child for coverage ("which
    * customers never appear in the event log") — same operator, swapped
    * frames.
    *
    * Plan: one LEFT ANTI join on the key (the parent side collapses to
    * distinct keys first, so a billion-row parent contributes its key
    * cardinality) plus one counting pass over the child keys; both
    * combine map-side. AQE broadcasts the distinct-parent side when it
    * fits. Output: one row (relation, n_child, n_null_fk, n_orphan,
    * orphan_rate). `orphan_rate` = n_orphan / (n_child − n_null_fk):
    * the rate among RESOLVABLE FKs — null-FK rows can never match, so
    * counting them in the denominator would understate integrity
    * violations on sparsely-populated FK columns. Null when the child
    * has no non-null FK rows (never NaN).
    */
  def referentialAudit(relation: String, child: DataFrame,
      childKey: org.apache.spark.sql.Column, parent: DataFrame,
      parentKey: org.apache.spark.sql.Column): DataFrame = {
    val ck = child.select(childKey.as("k"))
    val orphan = ck.where(col("k").isNotNull)
      .join(parent.select(parentKey.as("k")).distinct(), Seq("k"),
        "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    val base = ck.agg(count(lit(1)).as("n_child"),
      sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_fk"))
    base.crossJoin(orphan).select(lit(relation).as("relation"),
      col("n_child"), col("n_null_fk"), col("n_orphan"),
      when(col("n_child") - col("n_null_fk") > 0L,
        round(col("n_orphan").cast("double") /
          (col("n_child") - col("n_null_fk")).cast("double"), 6))
        .as("orphan_rate"))
  }
}
