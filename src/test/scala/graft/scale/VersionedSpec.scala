package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the manifest-versioned table ([[Versioned]]): time travel
  * correctness over an upsert chain, O(1) rollback via manifest sharing,
  * immutable reader snapshots across later commits (the concurrent-reader
  * safety the applyCdcStream directory swap cannot give), and loud
  * same-version commit conflicts.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_vspec").toString + "/t"

  private def snap(k: Long, root: String): Set[(Long, String, Long)] =
    Versioned.readAt(spark, root, k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("init/commitUpsert/readAt: every version stays readable and exact") {
    val root = freshRoot()
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "version")
    assert(Versioned.init(spark, root, base) == 0L)
    // v1: update k=2, insert k=4
    val b1 = Seq((2L, "B", 2L, "U"), (4L, "d", 2L, "I"))
      .toDF("k", "v", "version", "op")
    assert(Versioned.commitUpsert(spark, root, b1, Seq("k"), "version") == 1L)
    // v2: delete k=1
    val b2 = Seq((1L, "a", 3L, "D")).toDF("k", "v", "version", "op")
    assert(Versioned.commitUpsert(spark, root, b2, Seq("k"), "version") == 2L)
    assert(Versioned.versions(spark, root) == Seq(0L, 1L, 2L))
    assert(Versioned.latestVersion(spark, root) == 2L)
    assert(snap(0L, root) == Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    assert(snap(1L, root) == Set((1L, "a", 1L), (2L, "B", 2L),
      (3L, "c", 1L), (4L, "d", 2L)))
    assert(snap(2L, root) == Set((2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
    // readLatest == readAt(max)
    assert(Versioned.readLatest(spark, root).count() == 3L)
  }

  test("rollback shares files (no rewrite), branches history forward") {
    val root = freshRoot()
    Versioned.init(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version"))
    Versioned.commitUpsert(spark, root,
      Seq((2L, "B", 2L, "U")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    Versioned.commitUpsert(spark, root,
      Seq((1L, "a", 3L, "D")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    val v3 = Versioned.rollback(spark, root, 1L)
    assert(v3 == 3L)
    // O(1): the rollback manifest POINTS AT v1's files, byte for byte
    assert(Versioned.manifestFiles(spark, root, 3L) ==
      Versioned.manifestFiles(spark, root, 1L))
    assert(snap(3L, root) == snap(1L, root))
    // the rolled-back-FROM state is STILL readable (history, not erasure)
    assert(snap(2L, root) == Set((2L, "B", 2L)))
    // a post-rollback commit branches from v3 (= v1), not from v2
    Versioned.commitUpsert(spark, root,
      Seq((1L, "A2", 4L, "U")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    assert(snap(4L, root) == Set((1L, "A2", 4L), (2L, "B", 2L)))
    // rolling back PAST the latest is refused
    val e = intercept[IllegalArgumentException] {
      Versioned.rollback(spark, root, 99L)
    }
    assert(e.getMessage.contains("uncommitted"))
  }

  test("a reader's resolved snapshot survives later commits and rollbacks") {
    val root = freshRoot()
    Versioned.init(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version"))
    // reader resolves version 0 NOW (plan built, files pinned)...
    val reader = Versioned.readAt(spark, root, 0L)
    val before = reader.collect().map(_.toString).sorted.toSeq
    // ...then the table moves on: two commits and a rollback, each a full
    // rewrite into NEW directories — nothing the reader resolved is touched
    Versioned.commitUpsert(spark, root,
      Seq((1L, "X", 2L, "U"), (2L, "b", 2L, "D"))
        .toDF("k", "v", "version", "op"), Seq("k"), "version")
    Versioned.commitUpsert(spark, root,
      Seq((9L, "z", 3L, "I")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    Versioned.rollback(spark, root, 0L)
    val after = reader.collect().map(_.toString).sorted.toSeq
    assert(after == before, "reader snapshot changed under concurrent commits")
    // and a fresh time-travel read of v0 still agrees
    assert(Versioned.readAt(spark, root, 0L)
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("vacuum honors manifest sharing and keeps retained versions readable") {
    val root = freshRoot()
    Versioned.init(spark, root,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "version"))
    Versioned.commitUpsert(spark, root,
      Seq((2L, "B", 2L, "U")).toDF("k", "v", "version", "op"),
      Seq("k"), "version") // v1
    Versioned.rollback(spark, root, 0L) // v2 SHARES v0's files
    Versioned.commitUpsert(spark, root,
      Seq((3L, "c", 3L, "I")).toDF("k", "v", "version", "op"),
      Seq("k"), "version") // v3 (on top of v2 = v0)
    val v0Snap = snap(0L, root)
    val v3Snap = snap(3L, root)
    // keep v2 and v3: v1's files die, but v0's files SURVIVE because the
    // retained rollback manifest v2 still references them
    val deleted = Versioned.vacuum(spark, root, keepVersions = 2)
    assert(deleted > 0L, "v1's unreferenced files should have died")
    assert(Versioned.versions(spark, root) == Seq(2L, 3L))
    assert(snap(2L, root) == v0Snap, "shared files must survive the vacuum")
    assert(snap(3L, root) == v3Snap)
    // the dropped versions are gone from the log (time travel refuses)
    val e = intercept[IllegalArgumentException] {
      Versioned.readAt(spark, root, 1L)
    }
    assert(e.getMessage.contains("not committed"))
    // and the table still commits forward after a vacuum
    Versioned.commitUpsert(spark, root,
      Seq((1L, "a", 4L, "D")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    assert(snap(4L, root) == v3Snap.filterNot(_._1 == 1L))
  }

  test("stats pruning: a selective read touches a strict file subset, " +
      "byte-identical rows") {
    val root = freshRoot()
    // range-clustered files so per-file k ranges are disjoint: pruning has
    // something to prune
    val df = spark.range(1, 1001).toDF("k")
      .withColumn("v", concat(lit("x"), $"k"))
      .withColumn("version", lit(1L))
      .repartitionByRange(4, $"k")
    Versioned.init(spark, root, df)
    val all = Versioned.manifestFiles(spark, root, 0L)
    assert(all.size == 4)
    // every file carries k stats in the manifest
    val entries = Versioned.manifestEntries(spark, root, 0L)
    assert(entries.forall(_._2.contains("k")),
      s"missing k stats: ${entries.map(_._2.keySet)}")
    val pruned = Versioned.prunedFiles(spark, root, 0L, "k",
      Some(BigDecimal(1)), Some(BigDecimal(50)))
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"expected a strict subset, got ${pruned.size} of ${all.size}")
    val viaPruned = Versioned.readAtRange(spark, root, 0L, "k",
      Some(BigDecimal(1)), Some(BigDecimal(50)))
      .collect().map(_.toString).sorted.toSeq
    val viaFull = Versioned.readAt(spark, root, 0L)
      .where($"k" >= 1 && $"k" <= 50)
      .collect().map(_.toString).sorted.toSeq
    assert(viaPruned == viaFull)
    // an out-of-range read prunes everything and returns zero rows
    val none = Versioned.readAtRange(spark, root, 0L, "k",
      Some(BigDecimal(5000)), None)
    assert(Versioned.prunedFiles(spark, root, 0L, "k",
      Some(BigDecimal(5000)), None).isEmpty)
    assert(none.count() == 0L)
    // a column without stats falls back to the full list (conservative)
    assert(Versioned.prunedFiles(spark, root, 0L, "no_such_col",
      Some(BigDecimal(0)), Some(BigDecimal(0))).size == all.size)
    // a multi-column conjunction prunes at least as tightly as either
    // range alone, and stays row-exact
    val both = Versioned.prunedFilesMulti(spark, root, 0L, Seq(
      ("k", Some(BigDecimal(1)), Some(BigDecimal(50))),
      ("version", Some(BigDecimal(1)), Some(BigDecimal(1)))))
    assert(both.toSet.subsetOf(pruned.toSet))
    val viaBoth = Versioned.readAtRanges(spark, root, 0L, Seq(
        ("k", Some(BigDecimal(1)), Some(BigDecimal(50))),
        ("version", Some(BigDecimal(1)), Some(BigDecimal(1)))))
      .collect().map(_.toString).sorted.toSeq
    assert(viaBoth == viaFull)
    // a conjunction with an impossible second range prunes everything
    assert(Versioned.prunedFilesMulti(spark, root, 0L, Seq(
      ("k", Some(BigDecimal(1)), Some(BigDecimal(50))),
      ("version", Some(BigDecimal(9)), None))).isEmpty)
  }

  test("compaction: fewer files, identical rows, history intact") {
    val root = freshRoot()
    val df = spark.range(1, 501).toDF("k")
      .withColumn("v", concat(lit("x"), $"k"))
      .withColumn("version", lit(1L))
      .repartition(8)
    Versioned.init(spark, root, df) // v0: 8 files
    val v0Rows = Versioned.readAt(spark, root, 0L)
      .collect().map(_.toString).sorted.toSeq
    val v0Files = Versioned.manifestFiles(spark, root, 0L)
    assert(v0Files.size == 8)
    // huge target => everything bin-packs into one file
    val v1 = Versioned.commitCompaction(spark, root,
      targetFileBytes = 1L << 30)
    assert(v1 == 1L)
    val v1Files = Versioned.manifestFiles(spark, root, 1L)
    assert(v1Files.size < v0Files.size, s"${v1Files.size} vs ${v0Files.size}")
    assert(Versioned.readLatest(spark, root)
      .collect().map(_.toString).sorted.toSeq == v0Rows)
    // time travel to the pre-compaction version still reads the OLD files
    assert(Versioned.readAt(spark, root, 0L)
      .collect().map(_.toString).sorted.toSeq == v0Rows)
    // and a post-compaction upsert carries on from the compacted snapshot
    Versioned.commitUpsert(spark, root,
      Seq((1L, "ONE", 2L, "U")).toDF("k", "v", "version", "op"),
      Seq("k"), "version") // v2
    assert(Versioned.readLatest(spark, root)
      .where($"k" === 1L).select("v").collect().head.getString(0) == "ONE")
    // vacuum to the post-compaction versions: old small files die
    val deleted = Versioned.vacuum(spark, root, keepVersions = 2)
    assert(deleted >= v0Files.size, s"deleted only $deleted")
    assert(Versioned.readAt(spark, root, 1L)
      .collect().map(_.toString).sorted.toSeq == v0Rows)
  }

  test("vacuum never touches staging dirs above the dropped-version bound") {
    val root = freshRoot()
    Versioned.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "version"))
    Versioned.commitUpsert(spark, root,
      Seq((2L, "b", 2L, "I")).toDF("k", "v", "version", "op"),
      Seq("k"), "version") // v1
    // a concurrent committer's in-flight staging dir for v2 (no manifest
    // yet) and a crashed/losing attempt's garbage for dropped v0
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def plant(dir: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$root/data/$dir/part-0.parquet")
      val out = fs.create(p, false)
      out.write(Array[Byte](1, 2, 3)); out.close(); p
    }
    val inFlight = plant("v2-aaaa-in-flight")
    val crashed = plant("v0-bbbb-crashed")
    Versioned.vacuum(spark, root, keepVersions = 1) // drops v0 only
    assert(fs.exists(inFlight),
      "vacuum must not touch staging dirs above the dropped bound")
    assert(!fs.exists(crashed),
      "a crashed attempt's garbage at a dropped version is reclaimed")
    assert(Versioned.readLatest(spark, root).count() == 2L)
  }

  test("rollback whose files a vacuum removed fails loudly and withdraws") {
    val root = freshRoot()
    Versioned.init(spark, root,
      Seq((1L, "a", 1L)).toDF("k", "v", "version"))
    Versioned.commitUpsert(spark, root,
      Seq((2L, "b", 2L, "I")).toDF("k", "v", "version", "op"),
      Seq("k"), "version") // v1
    // simulate the lost race: v0's manifest still exists but its data
    // file is gone (a concurrent vacuum deleted it mid-rollback)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Versioned.manifestFiles(spark, root, 0L).foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false)
    }
    val e = intercept[java.io.IOException] {
      Versioned.rollback(spark, root, 0L)
    }
    assert(e.getMessage.contains("concurrent vacuum"), e.getMessage)
    // the bad manifest was withdrawn: the table is still at v1 and commits
    // forward cleanly
    assert(Versioned.latestVersion(spark, root) == 1L)
    Versioned.commitUpsert(spark, root,
      Seq((3L, "c", 3L, "I")).toDF("k", "v", "version", "op"),
      Seq("k"), "version")
    assert(Versioned.readLatest(spark, root).count() == 3L)
  }

  test("same-version commit conflicts are loud, not last-write-wins") {
    val root = freshRoot()
    Versioned.init(spark, root, Seq((1L, "a", 1L)).toDF("k", "v", "version"))
    // a second init (version 0 again) must refuse
    val e1 = intercept[IllegalArgumentException] {
      Versioned.init(spark, root, Seq((2L, "b", 1L)).toDF("k", "v", "version"))
    }
    assert(e1.getMessage.contains("already exists"))
    // reading an uncommitted version must refuse, not return garbage
    val e2 = intercept[IllegalArgumentException] {
      Versioned.readAt(spark, root, 7L)
    }
    assert(e2.getMessage.contains("not committed"))
  }
}
