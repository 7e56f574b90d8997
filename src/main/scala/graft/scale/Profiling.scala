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

  /** Embedding-space drift per group: cosine distance between each
    * group's mean embedding and the corpus mean embedding — the
    * semantic-drift monitor next to the token-distribution KL (q106).
    * A source whose topical center moves (new crawl behavior, spam
    * injection, encoder change) shows up here before token statistics
    * shift.
    *
    * Determinism: per-dimension means are 6dp-rounded (the q97 KMeans
    * convention — the 1-ulp partial-aggregation wobble of a distributed
    * mean cannot survive the rounding), and the cosine is computed by
    * pos-sorted pinned folds over the (group mean, corpus mean) pairs,
    * so the quotient is reproducible cross-engine.
    *
    * Shape: the corpus-sized work is the exploded (group, pos) / (pos)
    * mean aggregates (map-side combined; state = groups × dim cells).
    * Everything after operates on groups × dim rows. The two aggregates
    * scan the corpus twice; a single-pass variant would carry exact
    * per-(group, pos) DECIMAL sums and derive the corpus mean from the
    * group sums — worth it only when the scan dominates, and it trades
    * away the simple rounded-mean determinism contract used here.
    */
  def embeddingDrift(emb: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val ex = emb.select(col(groupCol).as("grp"),
      posexplode(transform(col(vecCol), x => x.cast("double")))
        .as(Seq("pos", "x")))
    val gm = ex.groupBy(col("grp"), col("pos"))
      .agg(round(avg(col("x")), 6).as("m"))
    val cm = ex.groupBy(col("pos"))
      .agg(round(avg(col("x")), 6).as("mc"))
    val n = emb.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_vecs"))
    val paired = gm.join(cm, "pos")
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m"), col("mc"))))
        .as("a"))
    def fold(f: Column => Column): Column =
      aggregate(col("a"), lit(0d), (s, e) => s + f(e))
    paired.join(n, "grp")
      .select(col("grp").as(groupCol), col("n_vecs"),
        round(lit(1d) -
          fold(e => e.getField("m") * e.getField("mc")) /
            (sqrt(fold(e => e.getField("m") * e.getField("m"))) *
              sqrt(fold(e => e.getField("mc") * e.getField("mc")))), 6)
          .as("drift"))
  }
}
