package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Sort-ordered parquet layout: the data-layout half of predicate pushdown.
  *
  * Pushing a range filter into the parquet reader only pays off if the
  * row-group min/max statistics can actually exclude row groups — and
  * after a hash shuffle every row group spans the whole value range, so
  * NOTHING is excluded: the scan decompresses every page and discards rows
  * one by one. Writing range-partitioned-and-sorted
  * (`repartitionByRange(col) + sortWithinPartitions(col)`) makes file and
  * row-group ranges narrow and pairwise disjoint, so a time-window or
  * key-range query at 100 TB touches only the files that can match — the
  * same reason every warehouse clusters fact tables by date.
  *
  * This module writes the layout and PROVES the property from the parquet
  * footers (no trust in the writer): [[columnRanges]] reads each file's
  * row-group statistics via the parquet-hadoop API that ships in Spark's
  * own jars, and ScaleSpec asserts (a) disjointness across files and (b)
  * that a selective range filter prunes most row groups.
  */
object Layout {

  /** Write `df` range-clustered by `c` into `numFiles` sorted parquet
    * files. Range partitioning samples the column to pick balanced split
    * points (skew-tolerant: a hot value makes a bigger file, never a
    * wrong one).
    */
  def writeSorted(df: DataFrame, path: String, c: Column, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, c)
      .sortWithinPartitions(c)
      .write.mode("overwrite").parquet(path)

  /** Per-row-group (min, max, rows) for a long-typed column, straight from
    * the parquet footers: the ground truth the reader's row-group skipping
    * uses. Returns one triple per row group across all files under `path`.
    */
  def columnRanges(spark: SparkSession, path: String, column: String):
      Seq[(Long, Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path)).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val cc = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(sys.error(s"column $column not in ${f.getPath}"))
          val stats = cc.getStatistics
          (stats.genericGetMin.asInstanceOf[Number].longValue,
            stats.genericGetMax.asInstanceOf[Number].longValue,
            block.getRowCount)
        }
      } finally reader.close()
    }
  }

  /** How many row groups of `path` a `[lo, hi]` range predicate on
    * `column` could NOT skip — the planner-independent measure of layout
    * quality ScaleSpec asserts on (sorted layout → a narrow window hits
    * few groups; hash layout → it hits all of them).
    */
  def survivingRowGroups(spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): Int =
    columnRanges(spark, path, column).count { case (mn, mx, _) =>
      mx >= lo && mn <= hi
    }
}
