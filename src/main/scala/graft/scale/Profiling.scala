package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "ANALYZE TABLE for humans" pass a
  * 100 TB ingest runs before anything else: per-column row/non-null/
  * distinct counts and min/max, one output row per profiled column.
  *
  * Two modes with different physical shapes, neither of which touches
  * Spark's multi-distinct Expand path (which would replicate every input
  * row once per profiled column):
  *
  *   - **approx (default, the scale path)**: `approx_count_distinct`
  *     (HLL++) for every column in ONE single-pass aggregation — a
  *     narrow scan into one partial-agg row per partition, no Expand,
  *     no shuffle of data rows; the only exchange carries one sketch
  *     row per partition. This is the mode that survives 100 TB.
  *   - **exact**: one aggregation branch PER COLUMN, unioned. Each
  *     branch scans only its own column (columnar pruning makes C
  *     one-column scans the same total bytes as one C-column scan) and
  *     Spark plans its single `count(DISTINCT)` as a two-level
  *     aggregation — partial-distinct by value, then merge — with no
  *     Expand anywhere. The distinct pre-aggregation still holds every
  *     distinct value of that one column, which is the irreducible cost
  *     of an exact answer; columns whose cardinality approaches the row
  *     count make approx mode the right tool.
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
    if (exact) {
      cols.map { c =>
        df.select(df(c).as("v"))
          .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_nonnull"),
            count_distinct(col("v")).as("n_distinct"),
            min(col("v")).cast("string").as("min_value"),
            max(col("v")).cast("string").as("max_value"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_ union _).orderBy(col("col_name"))
    } else {
      // Intermediate aliases are POSITIONAL (nn_0, nd_0, …), never the
      // user's column names: a name containing a quote or backtick must
      // not reach any parsed identifier. The original name travels only
      // as a string literal in the output struct.
      val aggs: Seq[Column] = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(df(c)).as(s"nn_$i"),
          approx_count_distinct(df(c)).as(s"nd_$i"),
          min(df(c)).cast("string").as(s"mn_$i"),
          max(df(c)).cast("string").as(s"mx_$i"))
      }
      val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      // unpivot the single stats row to one row per column with a pure
      // DataFrame-API explode (no string-built SQL): Generate over an
      // already-1-row input — free.
      val perCol = cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("col_name"), col(s"nn_$i").as("n_nonnull"),
          col(s"nd_$i").as("n_distinct"), col(s"mn_$i").as("min_value"),
          col(s"mx_$i").as("max_value"))
      }
      one.select(explode(array(perCol: _*)).as("p"), col("n_rows"))
        .select(col("p.col_name").as("col_name"), col("n_rows"),
          col("p.n_nonnull").as("n_nonnull"),
          col("p.n_distinct").as("n_distinct"),
          col("p.min_value").as("min_value"),
          col("p.max_value").as("max_value"))
        .orderBy(col("col_name"))
    }
  }
}
