package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot versioning / time travel over the CDC family —
  * the poor-man's-Delta that completes the lakehouse story: a table is a
  * directory of IMMUTABLE per-version data files plus a `_manifests/` log
  * (one file per version listing that version's data files, each with
  * optional per-file column min/max stats for data skipping). Readers never
  * observe torn state by construction:
  *
  *   - a COMMIT is exactly one atomic manifest-file creation
  *     (write-temp → rename; Hadoop rename refuses an existing
  *     destination, so two racing writers of the same version conflict
  *     loudly instead of last-write-wins) — the Delta-log discipline,
  *     which is strictly safer than [[graft.streaming.Streaming
  *     .applyCdcStream]]'s directory swap (there a reader between the two
  *     renames sees a missing path; here old manifests and old data files
  *     are never touched);
  *   - every commit ATTEMPT writes its data into its own UNIQUE staging
  *     directory (`data/v<k>-<uuid>/`) that only its own manifest can
  *     reference — two racing same-version committers never share a data
  *     path, so the manifest rename FULLY arbitrates the race: the winner's
  *     manifest lists the winner's files, the loser's staging directory is
  *     unreferenced garbage for [[vacuum]] to reclaim (never half of each,
  *     which a shared `data/v<k>/` path allowed);
  *   - the CURRENT version is simply the max manifest — no pointer file,
  *     no swap window;
  *   - a reader that resolved version k's file list keeps a consistent
  *     snapshot forever: later commits and rollbacks only ADD manifests
  *     and data directories (VersionedSpec pins this with a
  *     read-before-commit / collect-after witness);
  *   - ROLLBACK is a new version whose manifest points at the old
  *     version's files — O(1) metadata, zero data movement, history
  *     preserved (an audit can still read the rolled-back state).
  *
  * '''Vacuum safety contract (temporal, like Delta's).''' [[vacuum]] only
  * deletes files under version directories AT OR BELOW the newest version
  * whose manifest it just dropped — a concurrent commit stages its data at
  * `latest+1`, strictly above every droppable version, so in-flight
  * writers are structurally out of vacuum's reach. What remains is the
  * retention-edge discipline Delta also demands: a [[rollback]] targeting
  * a version that vacuum is concurrently dropping can lose the race, which
  * is why rollback VERIFIES its referenced files after committing and
  * fails loudly (deleting its own manifest) instead of publishing an
  * unreadable version. Keep `keepVersions` ≥ the longest reader/rollback
  * lifetime and the race cannot arise at all.
  *
  * [[commitUpsert]] materializes each version as a full snapshot rewrite
  * (the [[Cdc.upsert]] one-shuffle merge) into a fresh staging directory.
  * At 100 TB the rewrite is bounded the usual way — the base bucketed on
  * the merge key so only changed buckets rewrite — and an incremental
  * file-level commit slots into the SAME manifest contract (a manifest is
  * just a file list; which files are new is the writer's business).
  * [[commitCompaction]] is exactly that: a bin-packed rewrite of the
  * current snapshot committed as a new version, leaving history intact.
  */
object Versioned {

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def manifestDir(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/_manifests")

  private def manifestPath(root: String, version: Long) =
    new org.apache.hadoop.fs.Path(s"$root/_manifests/v$version.manifest")

  /** "v3" or "v3-<uuid>" → 3; anything else → None. Both forms appear
    * under `data/`: bare `v<k>` from pre-staging commits, suffixed from
    * current ones.
    */
  private def dirVersion(name: String): Option[Long] = {
    if (!name.startsWith("v")) return None
    val cut = name.indexOf('-')
    val digits = if (cut > 0) name.substring(1, cut) else name.substring(1)
    if (digits.nonEmpty && digits.forall(_.isDigit)) Some(digits.toLong)
    else None
  }

  private def isMarker(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** All committed versions, ascending (empty if the table is absent). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, _) = fsOf(spark, root)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  /** The current version (max manifest). */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no versioned table at $root")
    vs.max
  }

  /** The raw manifest lines of a committed version: one per data file,
    * `<path>` or `<path>\t<stats>` where stats is `col:min:max;…` over the
    * file's numeric columns (footer min/max, collected at commit time).
    */
  private def manifestLines(spark: SparkSession, root: String,
      version: Long): Seq[String] = {
    val (fs, _) = fsOf(spark, root)
    val mp = manifestPath(root, version)
    require(fs.exists(mp), s"version $version not committed at $root")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The immutable file list of a committed version (metadata lines —
    * `#`-prefixed — excluded).
    */
  def manifestFiles(spark: SparkSession, root: String,
      version: Long): Seq[String] =
    manifestLines(spark, root, version)
      .filterNot(_.startsWith("#")).map(_.split('\t')(0))

  /** A version's metadata entries (the `#`-prefixed manifest lines,
    * prefix stripped): writer-supplied commit annotations — e.g. the
    * `batch:<id>` tag [[graft.streaming.Streaming.applyCdcStreamVersioned]]
    * uses as its exactly-once ledger. Empty for untagged commits.
    */
  def manifestMeta(spark: SparkSession, root: String,
      version: Long): Seq[String] =
    manifestLines(spark, root, version)
      .filter(_.startsWith("#")).map(_.substring(1))

  /** Per-file column stats of a committed version: (path, col →
    * (min, max)) — empty map for files committed before stats existed or
    * whose footers carried no usable numeric statistics.
    */
  def manifestEntries(spark: SparkSession, root: String, version: Long)
      : Seq[(String, Map[String, (BigDecimal, BigDecimal)])] =
    manifestLines(spark, root, version)
      .filterNot(_.startsWith("#")).map { line =>
      val cut = line.indexOf('\t')
      if (cut < 0) (line, Map.empty[String, (BigDecimal, BigDecimal)])
      else {
        val stats = line.substring(cut + 1).split(';').toSeq
          .filter(_.nonEmpty).flatMap { part =>
            // rsplit twice: column names never contain ':' (enforced at
            // collection), so the LAST two fields are min and max
            val b = part.lastIndexOf(':')
            val a = if (b > 0) part.lastIndexOf(':', b - 1) else -1
            if (a <= 0) None
            else try Some(part.substring(0, a) ->
              (BigDecimal(part.substring(a + 1, b)),
                BigDecimal(part.substring(b + 1))))
            catch { case _: NumberFormatException => None }
          }.toMap
        (line.substring(0, cut), stats)
      }
    }

  /** Time travel: the table exactly as of `version`. */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(manifestFiles(spark, root, version): _*)

  /** The current table (max committed version). */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, latestVersion(spark, root))

  /** The subset of `version`'s files whose footer min/max for `colName`
    * can overlap [lo, hi] (either bound optional, both inclusive). Files
    * without stats for the column are kept — pruning is conservative,
    * never lossy. This is the manifest-as-zone-map read path: at 100 TB
    * a selective read touches the matching files' footers only, instead
    * of handing Spark the full list to enumerate.
    */
  def prunedFiles(spark: SparkSession, root: String, version: Long,
      colName: String, lo: Option[BigDecimal],
      hi: Option[BigDecimal]): Seq[String] =
    prunedFilesMulti(spark, root, version, Seq((colName, lo, hi)))

  /** [[prunedFiles]] over a CONJUNCTION of column ranges: a file
    * survives only if every range can overlap its stats — multi-column
    * zone-map pruning (each missing stat is conservatively permissive,
    * so the intersection only ever tightens correctly).
    */
  def prunedFilesMulti(spark: SparkSession, root: String, version: Long,
      ranges: Seq[(String, Option[BigDecimal], Option[BigDecimal])])
      : Seq[String] = {
    require(ranges.nonEmpty, "at least one column range required")
    manifestEntries(spark, root, version).collect {
      case (path, stats) if ranges.forall { case (c, lo, hi) =>
        stats.get(c).forall { case (mn, mx) =>
          lo.forall(l => mx >= l) && hi.forall(h => mn <= h)
        }
      } => path
    }
  }

  /** Time travel restricted to `colName` ∈ [lo, hi]: the file list is
    * pruned against the manifest's per-file stats BEFORE Spark ever sees
    * it, then the residual filter is applied (stats pruning is
    * file-granular; rows inside a surviving file still need the
    * predicate). Result is row-identical to
    * `readAt(version).where(lo <= col && col <= hi)` — VersionedSpec pins
    * both the equality and the strict-subset file list.
    */
  def readAtRange(spark: SparkSession, root: String, version: Long,
      colName: String, lo: Option[BigDecimal],
      hi: Option[BigDecimal]): DataFrame =
    readAtRanges(spark, root, version, Seq((colName, lo, hi)))

  /** [[readAtRange]] over a conjunction of column ranges (the
    * [[prunedFilesMulti]] intersection, residual AND filter applied).
    */
  def readAtRanges(spark: SparkSession, root: String, version: Long,
      ranges: Seq[(String, Option[BigDecimal], Option[BigDecimal])])
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val all = manifestFiles(spark, root, version)
    val pruned = prunedFilesMulti(spark, root, version, ranges)
    // an all-pruned read still needs a schema source: scan one file, let
    // the residual filter return its zero rows
    val use = if (pruned.nonEmpty) pruned else all.take(1)
    val base = spark.read.parquet(use: _*)
    val residual = ranges.map { case (name, lo, hi) =>
      val c = col(name)
      val withLo = lo.map(l => c >= lit(l.bigDecimal)).getOrElse(lit(true))
      val withHi = hi.map(h => c <= lit(h.bigDecimal)).getOrElse(lit(true))
      withLo && withHi
    }.reduce(_ && _)
    base.where(residual)
  }

  /** Create the table: commit `df` as version 0. Fails if any version
    * already exists.
    */
  def init(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(versions(spark, root).isEmpty,
      s"versioned table already exists at $root")
    commitData(spark, root, df, 0L)
  }

  /** MERGE a change batch into the current version and commit the result
    * as version current+1 ([[Cdc.upsert]] semantics: highest versionCol
    * wins per key, change beats base on ties, `deleteOp` rows tombstone).
    * Returns the new version.
    */
  def commitUpsert(spark: SparkSession, root: String, changes: DataFrame,
      keyCols: Seq[String], versionCol: String, opCol: String = "op",
      deleteOp: String = "D", meta: Seq[String] = Nil): Long = {
    val k = latestVersion(spark, root)
    val next = Cdc.upsert(readAt(spark, root, k), changes, keyCols,
      versionCol, opCol, deleteOp)
    commitData(spark, root, next, k + 1, meta)
  }

  /** Rewrite the CURRENT snapshot bin-packed into ~`targetFileBytes`
    * files and commit it as a new version — the small-file compaction a
    * CDC stream needs ([[graft.streaming.Streaming.applyCdcStreamVersioned]]
    * accretes a file set per commit). History stays intact: time travel
    * to pre-compaction versions reads the old files untouched, and
    * [[vacuum]] reclaims them once they age out of retention. `coalesce`
    * (never `repartition`) merges partitions without a shuffle, so any
    * within-partition sort the files carry is preserved. Returns the new
    * version.
    */
  def commitCompaction(spark: SparkSession, root: String,
      targetFileBytes: Long = 128L << 20): Long = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive: $targetFileBytes")
    val k = latestVersion(spark, root)
    val files = manifestFiles(spark, root, k)
    val (fs, _) = fsOf(spark, root)
    val totalBytes = files.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(files: _*).coalesce(nOut)
    commitData(spark, root, df, k + 1)
  }

  /** Commit a NEW version whose manifest points at `toVersion`'s files:
    * O(1) metadata, no data movement, history intact (the rolled-back
    * versions stay readable). Returns the new version.
    *
    * Rollback vs concurrent [[vacuum]]: only a rollback targeting a
    * version AT THE RETENTION EDGE (one vacuum is dropping right now) can
    * race — and it fails LOUDLY, not silently: after committing, the new
    * manifest's files are re-checked for existence, and on any miss the
    * manifest is withdrawn and the rollback throws. Keep rollback targets
    * within the vacuum retention window and the check never fires.
    */
  def rollback(spark: SparkSession, root: String, toVersion: Long): Long = {
    val k = latestVersion(spark, root)
    require(toVersion >= 0 && toVersion <= k,
      s"cannot roll back to uncommitted version $toVersion (latest $k)")
    // file lines (with their stats) are copied; the source's metadata
    // lines are NOT — a rollback is its own commit, not a replay of the
    // tagged commit it points at (a copied batch tag would corrupt the
    // streaming ledger's newest-tag scan)
    val lines = manifestLines(spark, root, toVersion)
      .filterNot(_.startsWith("#"))
    writeManifest(spark, root, k + 1, lines)
    val (fs, _) = fsOf(spark, root)
    val missing = lines.map(_.split('\t')(0))
      .filterNot(f => fs.exists(new org.apache.hadoop.fs.Path(f)))
    if (missing.nonEmpty) {
      fs.delete(manifestPath(root, k + 1), false): Unit
      throw new java.io.IOException(
        s"rollback to version $toVersion lost ${missing.size} file(s) to " +
          s"a concurrent vacuum (first: ${missing.head}); roll back only " +
          "within the vacuum retention window")
    }
    k + 1
  }

  /** Garbage-collect data files no RETAINED version references: drop the
    * manifests of all but the newest `keepVersions` versions, then delete
    * every unreferenced file under version directories AT OR BELOW the
    * newest dropped version. Rollback manifests SHARE files, so sharing
    * is honored by construction — a file stays as long as ANY surviving
    * manifest references it (the referenced set is recomputed from a
    * fresh manifest listing AFTER the drop, so commits and rollbacks that
    * landed mid-vacuum are honored too).
    *
    * Concurrent-committer safety is structural: an in-flight commit
    * stages its data under `data/v<latest+1>-<uuid>/`, strictly above
    * every droppable version number, so the version bound keeps vacuum
    * out of its way even though its manifest does not exist yet. The
    * losing/crashed staging directories of versions still inside
    * retention are left alone and reclaimed once their version ages
    * below the retention edge.
    *
    * Vacuum is the one operation that invalidates time travel (to the
    * dropped versions only) — run it on a retention schedule, never
    * inside a commit path, and keep `keepVersions` ≥ the longest
    * reader/rollback lifetime (the same discipline as Delta's VACUUM
    * retention). Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int): Long = {
    require(keepVersions >= 1, s"must keep at least one version: $keepVersions")
    val (fs, _) = fsOf(spark, root)
    val all = versions(spark, root)
    require(all.nonEmpty, s"no versioned table at $root")
    val keep = all.takeRight(keepVersions).toSet
    val dropped = all.filterNot(keep)
    if (dropped.isEmpty) return 0L
    // drop the dead manifests FIRST: a reader that lists versions after
    // this point can no longer resolve a manifest whose files are about
    // to disappear
    dropped.foreach { v =>
      fs.delete(manifestPath(root, v), false): Unit
    }
    val maxDropped = dropped.max
    // recompute the referenced set from a FRESH listing: any manifest that
    // appeared since (a commit or rollback landing mid-vacuum) is included
    val referenced = versions(spark, root)
      .flatMap(v => manifestFiles(spark, root, v)).toSet
    val dataRoot = new org.apache.hadoop.fs.Path(s"$root/data")
    if (!fs.exists(dataRoot)) return 0L
    var deleted = 0L
    for (dir <- fs.listStatus(dataRoot); if dir.isDirectory;
        k <- dirVersion(dir.getPath.getName); if k <= maxDropped) {
      val files = fs.listStatus(dir.getPath).toSeq
      val dead = files.filter(f =>
        !referenced.contains(f.getPath.toString) &&
          !isMarker(f.getPath.getName))
      dead.foreach { f => if (fs.delete(f.getPath, false)) deleted += 1 }
      // remove version dirs that now hold no data files (markers only)
      if (dead.nonEmpty && fs.listStatus(dir.getPath)
          .forall(f => isMarker(f.getPath.getName)))
        fs.delete(dir.getPath, true): Unit
    }
    deleted
  }

  /** Footer column stats of one written parquet file, encoded for the
    * manifest line: `col:min:max;…` over numeric primitive columns
    * (INT32/INT64/FLOAT/DOUBLE) whose statistics are present and valid in
    * EVERY row group. Columns with exotic names (':', ';', tab) are
    * skipped rather than escaped. Returns "" when nothing usable exists —
    * the line degrades to path-only, which every reader accepts.
    */
  private def fileStats(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path): String = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      if (blocks.isEmpty) return ""
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (BigDecimal, BigDecimal)]
      val invalid = scala.collection.mutable.Set.empty[String]
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val name = chunk.getPath.toDotString
        if (!invalid.contains(name) && !name.exists(c =>
            c == ':' || c == ';' || c == '\t')) {
          val stats: org.apache.parquet.column.statistics.Statistics[_] =
            chunk.getStatistics
          val tpe = chunk.getPrimitiveType.getPrimitiveTypeName
          val numeric = tpe == INT32 || tpe == INT64 ||
            tpe == FLOAT || tpe == DOUBLE
          if (!numeric || stats == null || stats.isEmpty) {
            invalid += name; acc.remove(name): Unit
          } else if (stats.hasNonNullValue) {
            val (mn, mx) = (stats.genericGetMin, stats.genericGetMax) match {
              case (a: java.lang.Integer, b: java.lang.Integer) =>
                (Some(BigDecimal(a.intValue)), Some(BigDecimal(b.intValue)))
              case (a: java.lang.Long, b: java.lang.Long) =>
                (Some(BigDecimal(a.longValue)), Some(BigDecimal(b.longValue)))
              case (a: java.lang.Float, b: java.lang.Float)
                  if !a.isNaN && !a.isInfinite && !b.isNaN && !b.isInfinite =>
                (Some(BigDecimal(a.doubleValue)), Some(BigDecimal(b.doubleValue)))
              case (a: java.lang.Double, b: java.lang.Double)
                  if !a.isNaN && !a.isInfinite && !b.isNaN && !b.isInfinite =>
                (Some(BigDecimal(a.doubleValue)), Some(BigDecimal(b.doubleValue)))
              case _ => (None, None)
            }
            (mn, mx) match {
              case (Some(lo), Some(hi)) =>
                val cur = acc.get(name)
                acc(name) = (cur.map(_._1.min(lo)).getOrElse(lo),
                  cur.map(_._2.max(hi)).getOrElse(hi))
              case _ => invalid += name; acc.remove(name): Unit
            }
          }
          // hasNonNullValue == false with valid stats: an all-null block —
          // contributes nothing but invalidates nothing
        }
      }
      acc.map { case (n, (mn, mx)) =>
        s"$n:${mn.bigDecimal.toPlainString}:${mx.bigDecimal.toPlainString}"
      }.mkString(";")
    } finally reader.close()
  }

  private def commitData(spark: SparkSession, root: String, df: DataFrame,
      version: Long, meta: Seq[String] = Nil): Long = {
    meta.foreach(m => require(!m.exists(c => c == '\n' || c == '\r'),
      s"manifest metadata must be single-line: $m"))
    // UNIQUE staging dir per commit ATTEMPT: two racing same-version
    // committers never share a data path, so the atomic manifest rename
    // below fully arbitrates the race (the loser's staging dir is
    // unreferenced garbage, reclaimed by vacuum once the version ages out
    // of retention). A crashed attempt leaves the same harmless garbage —
    // no cleanup-at-commit heuristic that could delete an in-flight
    // sibling's files.
    val dataDir = s"$root/data/v$version-${java.util.UUID.randomUUID()}"
    val (fs, _) = fsOf(spark, root)
    val dataPath = new org.apache.hadoop.fs.Path(dataDir)
    // an all-rows-deleted snapshot must still produce ≥ 1 schema-bearing
    // file, or the manifest would be empty and readAt would have no
    // schema source — one empty single-partition file carries it
    val toWrite = if (df.isEmpty) df.repartition(1) else df
    toWrite.write.mode("error").parquet(dataDir)
    val conf = spark.sessionState.newHadoopConf()
    val files = fs.listStatus(dataPath)
      .toSeq.map(_.getPath)
      .filter(p => !isMarker(p.getName))
      .sortBy(_.toString)
    require(files.nonEmpty, s"empty data dir for version $version at $root")
    // footer stats are read in PARALLEL: serial per-file opens cost
    // ~10-20 ms each and a commit can land 32+ AQE output files — read
    // serially that nearly doubled the q220 commit chain (5.2 s vs the
    // 2.7 s ref, round-15 probe); 8-way IO-bound reads make it noise
    val lines = if (files.size == 1) {
      val stats = fileStats(conf, files.head)
      Seq(if (stats.isEmpty) files.head.toString
      else s"${files.head}\t$stats")
    } else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(8, files.size))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[String]] =
          files.map(p => (() => {
            val stats = fileStats(conf, p)
            if (stats.isEmpty) p.toString else s"$p\t$stats"
          }): java.util.concurrent.Callable[String])
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    }
    writeManifest(spark, root, version, meta.map("#" + _) ++ lines)
    version
  }

  /** The one atomic commit action: temp write + rename. Rename onto an
    * existing manifest returns false on every sane FileSystem — surfaced
    * as a conflict, so concurrent committers of the same version cannot
    * silently clobber each other (optimistic concurrency).
    */
  private def writeManifest(spark: SparkSession, root: String,
      version: Long, lines: Seq[String]): Unit = {
    val (fs, _) = fsOf(spark, root)
    fs.mkdirs(manifestDir(root))
    val finalPath = manifestPath(root, version)
    if (fs.exists(finalPath))
      throw new java.io.IOException(
        s"commit conflict: version $version already exists at $root")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/_manifests/.v$version.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, finalPath)) {
      fs.delete(tmp, false): Unit
      throw new java.io.IOException(
        s"commit conflict: rename to $finalPath failed " +
          "(concurrent commit of the same version)")
    }
  }
}
