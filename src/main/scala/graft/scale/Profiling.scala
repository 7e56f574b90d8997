package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "ANALYZE TABLE for humans" pass a
  * 100 TB ingest runs before anything else: per-column row/non-null/
  * distinct counts and min/max, one output row per profiled column.
  *
  * Two modes with very different physical shapes:
  *
  *   - **approx (default, the scale path)**: `approx_count_distinct`
  *     (HLL++) for every column in ONE single-pass aggregation — a
  *     narrow scan into one partial-agg row per partition, no Expand,
  *     no shuffle of data rows; the only exchange carries one sketch
  *     row per partition. This is the mode that survives 100 TB.
  *   - **exact**: `count(DISTINCT c)` per column. Spark plans
  *     multi-distinct aggregates with an Expand node that replicates
  *     every input row once per distinct clause — profiling C columns
  *     scans the data once but aggregates C× the rows, and the
  *     distinct pre-aggregation holds every distinct value per column.
  *     Exact is for oracle verification and small tables; the scaladoc
  *     IS the warning label.
  *
  * min/max are rendered as strings so one schema profiles every column
  * type; numeric columns keep their native comparison order (the cast
  * happens AFTER the min/max aggregate, not before).
  */
object Profiling {

  /** Profile `cols` of `df`: one row per column, ordered by column name —
    * (col_name, n_rows, n_nonnull, n_distinct, min_value, max_value).
    * `n_distinct` ignores nulls (both engines' COUNT(DISTINCT)
    * semantics); min/max of an all-null column are null.
    */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val distinctOf: Column => Column =
      if (exact) c => count_distinct(c) else c => approx_count_distinct(c)
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        distinctOf(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // unpivot the single stats row to one row per column; stack is a
    // driver-side plan rewrite over an already-1-row input — free.
    val stackArgs = cols.map { c =>
      s"'$c', `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`"
    }.mkString(", ")
    one.select(
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nonnull, n_distinct, min_value, max_value)"),
      col("n_rows"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("col_name"))
  }
}
