package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot versioning / time travel over the CDC family —
  * the poor-man's-Delta that completes the lakehouse story: a table is a
  * directory of IMMUTABLE per-version data files plus a `_manifests/` log
  * (one file per version listing that version's data files). Readers never
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
  * [[commitUpsert]] materializes each version as a full snapshot rewrite
  * (the [[Cdc.upsert]] one-shuffle merge) into a fresh `data/v<k>/`
  * directory. At 100 TB the rewrite is bounded the usual way — the base
  * bucketed on the merge key so only changed buckets rewrite — and an
  * incremental file-level commit slots into the SAME manifest contract
  * (a manifest is just a file list; which files are new is the writer's
  * business). Vacuuming unreferenced files is an offline GC concern,
  * deliberately outside the commit path.
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

  /** The immutable file list of a committed version. */
  def manifestFiles(spark: SparkSession, root: String,
      version: Long): Seq[String] = {
    val (fs, _) = fsOf(spark, root)
    val mp = manifestPath(root, version)
    require(fs.exists(mp), s"version $version not committed at $root")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Time travel: the table exactly as of `version`. */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(manifestFiles(spark, root, version): _*)

  /** The current table (max committed version). */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, latestVersion(spark, root))

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
      deleteOp: String = "D"): Long = {
    val k = latestVersion(spark, root)
    val next = Cdc.upsert(readAt(spark, root, k), changes, keyCols,
      versionCol, opCol, deleteOp)
    commitData(spark, root, next, k + 1)
  }

  /** Commit a NEW version whose manifest points at `toVersion`'s files:
    * O(1) metadata, no data movement, history intact (the rolled-back
    * versions stay readable). Returns the new version.
    */
  def rollback(spark: SparkSession, root: String, toVersion: Long): Long = {
    val k = latestVersion(spark, root)
    require(toVersion >= 0 && toVersion <= k,
      s"cannot roll back to uncommitted version $toVersion (latest $k)")
    val files = manifestFiles(spark, root, toVersion)
    writeManifest(spark, root, k + 1, files)
    k + 1
  }

  /** Garbage-collect data files no RETAINED version references: drop the
    * manifests of all but the newest `keepVersions` versions, then delete
    * every file under `data/` that no surviving manifest lists. Rollback
    * manifests SHARE files, so sharing is honored by construction — a
    * file stays as long as ANY survivor references it. Returns the
    * number of data files deleted.
    *
    * Safety contract: vacuum is the one operation that invalidates time
    * travel (to the dropped versions only) — run it on a retention
    * schedule, never inside a commit path, and keep `keepVersions` ≥ the
    * longest reader lifetime (the same discipline as Delta's VACUUM
    * retention). Concurrent committers are safe: a new commit only adds
    * files under a version directory vacuum has already decided to keep
    * (version numbers are monotone and vacuum keeps the newest k).
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int): Long = {
    require(keepVersions >= 1, s"must keep at least one version: $keepVersions")
    val (fs, _) = fsOf(spark, root)
    val all = versions(spark, root)
    require(all.nonEmpty, s"no versioned table at $root")
    val keep = all.takeRight(keepVersions).toSet
    val referenced = keep.toSeq.sorted
      .flatMap(v => manifestFiles(spark, root, v)).toSet
    // drop the dead manifests FIRST: a reader that lists versions after
    // this point can no longer resolve a manifest whose files are about
    // to disappear
    all.filterNot(keep).foreach { v =>
      fs.delete(manifestPath(root, v), false): Unit
    }
    val dataRoot = new org.apache.hadoop.fs.Path(s"$root/data")
    if (!fs.exists(dataRoot)) return 0L
    var deleted = 0L
    for (dir <- fs.listStatus(dataRoot); if dir.isDirectory) {
      val files = fs.listStatus(dir.getPath).toSeq
      val (dead, live) = files.partition(f =>
        !referenced.contains(f.getPath.toString) &&
          !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      dead.foreach { f => if (fs.delete(f.getPath, false)) deleted += 1 }
      // remove version dirs that now hold no data files (markers only)
      if (live.forall(f => f.getPath.getName.startsWith("_") ||
          f.getPath.getName.startsWith(".")) && dead.nonEmpty &&
          fs.listStatus(dir.getPath).forall(f =>
            f.getPath.getName.startsWith("_") ||
              f.getPath.getName.startsWith(".")))
        fs.delete(dir.getPath, true): Unit
    }
    deleted
  }

  private def commitData(spark: SparkSession, root: String, df: DataFrame,
      version: Long): Long = {
    val dataDir = s"$root/data/v$version"
    val (fs, _) = fsOf(spark, root)
    val dataPath = new org.apache.hadoop.fs.Path(dataDir)
    // A data dir WITHOUT its manifest is an orphan of a crashed commit
    // attempt (data written, manifest never created — nothing references
    // it); clear it so the retry can write. A data dir WITH a manifest
    // means the version IS committed and mode("error") below surfaces
    // the caller bug.
    if (fs.exists(dataPath) &&
        !fs.exists(manifestPath(root, version)))
      fs.delete(dataPath, true): Unit
    // an all-rows-deleted snapshot must still produce ≥ 1 schema-bearing
    // file, or the manifest would be empty and readAt would have no
    // schema source — one empty single-partition file carries it
    val toWrite = if (df.isEmpty) df.repartition(1) else df
    toWrite.write.mode("error").parquet(dataDir)
    val files = fs.listStatus(dataPath)
      .toSeq.map(_.getPath)
      .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .map(_.toString).sorted
    require(files.nonEmpty, s"empty data dir for version $version at $root")
    writeManifest(spark, root, version, files)
    version
  }

  /** The one atomic commit action: temp write + rename. Rename onto an
    * existing manifest returns false on every sane FileSystem — surfaced
    * as a conflict, so concurrent committers of the same version cannot
    * silently clobber each other (optimistic concurrency).
    */
  private def writeManifest(spark: SparkSession, root: String,
      version: Long, files: Seq[String]): Unit = {
    val (fs, _) = fsOf(spark, root)
    fs.mkdirs(manifestDir(root))
    val finalPath = manifestPath(root, version)
    if (fs.exists(finalPath))
      throw new java.io.IOException(
        s"commit conflict: version $version already exists at $root")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/_manifests/.v$version.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, finalPath)) {
      fs.delete(tmp, false): Unit
      throw new java.io.IOException(
        s"commit conflict: rename to $finalPath failed " +
          "(concurrent commit of the same version)")
    }
  }
}
