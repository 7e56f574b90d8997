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

  /** Z-order (Morton) interleave of two non-negative integer columns,
    * `bitsPer` low bits each: x's bit i lands at output bit 2i, y's at
    * 2i+1. Built from plain shift/and/or column arithmetic, so it
    * constant-folds into whole-stage codegen — no UDF, no custom
    * expression needed. 21 bits per column keeps the result inside a
    * signed long (42 bits).
    */
  def zValue(x: Column, y: Column, bitsPer: Int = 21): Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(bitsPer >= 1 && bitsPer <= 31, s"bitsPer out of range: $bitsPer")
    (0 until bitsPer).map { i =>
      val xb = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` Z-ordered on two integer columns: range-partition and
    * sort by the interleaved Morton value. Linear sort on (a, b) makes
    * row-group pruning useless for filters on b alone; Z-ordering makes
    * BOTH columns' min/max ranges narrow per row group, so a selective
    * filter on EITHER column prunes most groups (the ScaleSpec assertion;
    * same idea as Delta/Iceberg OPTIMIZE ZORDER). The z column is dropped
    * before writing — it exists only to drive the clustering.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int, bitsPer: Int = 21): Unit =
    df.withColumn("__z", zValue(a, b, bitsPer))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet dataset toward `targetFileBytes` per file — the
    * small-files fix. Streaming sinks, per-task writes and fine-grained
    * partitioning leave thousands of KB-sized files; at 100 TB that
    * means millions of scan tasks and a hammered namenode/listing API.
    * Sizes the output file count from the dataset's CURRENT on-disk bytes
    * (compressed, from the filesystem — no data pass), then rewrites:
    * range-clustered by `sortCol` when given (preserving a [[writeSorted]]
    * layout's pruning property through the rewrite), plain repartition
    * otherwise. Returns the output file count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long, sortCol: Option[String] = None): Int = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val in = new Path(inPath)
    val fs = in.getFileSystem(conf)
    val bytes = fs.listStatus(in).toSeq
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out = sortCol match {
      case Some(c) => df.repartitionByRange(numFiles, df(c)).sortWithinPartitions(c)
      case None => df.repartition(numFiles)
    }
    out.write.mode("overwrite").parquet(outPath)
    numFiles
  }

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
