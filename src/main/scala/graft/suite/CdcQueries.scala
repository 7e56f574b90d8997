package graft.suite

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.scale.Cdc

/** Change-data-capture maintenance queries (Cdc.upsert / Cdc.scd2) — the
  * corpus-refresh shape: a base snapshot plus a derived change batch
  * (updates, inserts, delete tombstones) merged deterministically, and a
  * change log turned into SCD2 validity intervals.
  *
  * The change batch is DERIVED from the snapshot by pure modular arithmetic
  * so the oracle can rebuild the identical batch in SQL — no fixture files,
  * and the overlap classes (update∧delete on keys ≡ 0 mod 91, delete at a
  * higher version winning) are exercised by construction.
  */
object CdcQueries {

  /** Upsert-merge on orders: version-1 base; batch = status updates
    * (keys ≡ 0 mod 7, v2), re-keyed inserts (keys ≡ 0 mod 17, v2), delete
    * tombstones (keys ≡ 0 mod 13, v3 — so a key that is both updated and
    * deleted ends up deleted). Timestamps emitted as epoch micros per the
    * suite determinism rules; o_totalprice passes through untouched (exact
    * double equality).
    */
  private val q90 = GQuery(
    (s, d) => {
      val o = T.orders(s, d)
      val base = o.withColumn("version", lit(1L))
      val u = o.where(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("o_orderpriority", lit("0-REVISED"))
        .withColumn("version", lit(2L)).withColumn("op", lit("U"))
      val ins = o.where(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("version", lit(2L)).withColumn("op", lit("I"))
      val del = o.where(col("o_orderkey") % 13 === 0)
        .withColumn("version", lit(3L)).withColumn("op", lit("D"))
      Cdc.upsert(base, u.unionByName(ins).unionByName(del),
        Seq("o_orderkey"), "version")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          // o_orderdate ships as TIMESTAMP_NTZ; with the session TZ pinned
          // to UTC this cast is the identity DuckDB's epoch_us applies
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
          col("o_orderpriority"), col("version"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority, 1::BIGINT AS version,
          NULL AS op, 0 AS src
        FROM orders),
      u AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus, o_totalprice,
          o_orderdate, '0-REVISED' AS o_orderpriority, 2::BIGINT, 'U', 1
        FROM orders WHERE o_orderkey % 7 = 0),
      ins AS (
        SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
          o_totalprice, o_orderdate, o_orderpriority, 2::BIGINT, 'I', 1
        FROM orders WHERE o_orderkey % 17 = 0),
      del AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority, 3::BIGINT, 'D', 1
        FROM orders WHERE o_orderkey % 13 = 0),
      allr AS (
        SELECT * FROM base UNION ALL SELECT * FROM u
        UNION ALL SELECT * FROM ins UNION ALL SELECT * FROM del),
      rn AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
          ORDER BY version DESC, src DESC) AS rn
        FROM allr)
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        epoch_us(o_orderdate) AS o_date_us, o_orderpriority, version
      FROM rn WHERE rn = 1 AND (op IS NULL OR op <> 'D')
      ORDER BY o_orderkey"""))

  /** SCD2 intervals from the events stream: per (user, ts) state (min
    * event_type pins determinism when one user has several events at one
    * timestamp), then validity ranges via lead — valid_to null / is_current
    * on each user's last state.
    */
  private val q93 = GQuery(
    (s, d) => {
      val log0 = T.events(s, d).groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_type")).as("state"))
      Cdc.scd2(log0, Seq("user_id"), "ts")
        .select(col("user_id"), unix_micros(col("valid_from")).as("from_us"),
          unix_micros(col("valid_to")).as("to_us"), col("state"),
          col("is_current").cast("long").as("is_current"))
        .orderBy(col("user_id"), col("from_us"))
    },
    Some("""WITH s AS (
        SELECT user_id, ts, MIN(event_type) AS state
        FROM events GROUP BY user_id, ts)
      SELECT user_id, epoch_us(ts) AS from_us,
        epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS to_us,
        state,
        CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          AS BIGINT) AS is_current
      FROM s ORDER BY user_id, from_us"""))

  /** Incremental JOIN-view maintenance ([[graft.scale.Cdc.joinViewDelta]]):
    * orders⋈customer split into base/delta on both sides by pure
    * arithmetic (orders by date, customers by key residue); the stored
    * view (base⋈base) plus the three-delta term must equal the full
    * join of the merged tables — which is exactly what the oracle
    * computes, so a hash-match certifies the delta decomposition is
    * multiset-exact, not just count-right.
    */
  /** Snapshot versioning / time travel ([[graft.scale.Versioned]] — the
    * manifest-log table over [[Cdc.upsert]]): init → two upsert commits →
    * O(1) rollback → a further commit ON TOP of the rolled-back state,
    * then every version read back via time travel and unioned under its
    * snapshot_version. The oracle replays the chain as pure SQL folds
    * (s1 = upsert(base, A), s2 = upsert(s1, B), v3 = s1 again, s4 =
    * upsert(s1, C)), so one hash-match certifies read-at-version for all
    * five versions, the manifest indirection (v3 shares v1's files —
    * identical rows WITHOUT a rewrite), and that post-rollback commits
    * branch from the rolled-back state, not the rolled-back-FROM one.
    * VersionedSpec pins the concurrency story (immutable reader
    * snapshots, same-version commit conflicts).
    */
  private val q220 = GQuery(
    (s, d) => {
      val o = T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val base = o.where(col("o_orderkey") % 3 === 0)
        .withColumn("version", lit(1L))
      def up(mod: Int, status: String, v: Long) =
        base.where(col("o_orderkey") % mod === 0)
          .withColumn("o_orderstatus", lit(status))
          .withColumn("version", lit(v)).withColumn("op", lit("U"))
      val ins = base.where(col("o_orderkey") % 33 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 200000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("version", lit(2L)).withColumn("op", lit("I"))
      // deletes carry their own version: a key in BOTH the %12 update and
      // the %15 delete (%60) must resolve deterministically — same-version
      // same-source rows tie in the upsert window
      val del = base.where(col("o_orderkey") % 15 === 0)
        .withColumn("version", lit(4L)).withColumn("op", lit("D"))
      val root = Scratch.fresh("graft_vtab_") + "/orders"
      graft.scale.Versioned.init(s, root, base)
      graft.scale.Versioned.commitUpsert(s, root,
        up(21, "A", 2L).unionByName(ins), Seq("o_orderkey"), "version")
      graft.scale.Versioned.commitUpsert(s, root,
        up(12, "B", 3L).unionByName(del), Seq("o_orderkey"), "version")
      val v3 = graft.scale.Versioned.rollback(s, root, 1L)
      assert(v3 == 3L)
      graft.scale.Versioned.commitUpsert(s, root,
        up(30, "C", 3L), Seq("o_orderkey"), "version")
      (0L to 4L).map(k => graft.scale.Versioned.readAt(s, root, k)
          .withColumn("snapshot_version", lit(k)))
        .reduce(_ unionByName _)
        .select(col("snapshot_version"), col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"), col("version"))
        .orderBy(col("snapshot_version"), col("o_orderkey"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1::BIGINT AS version
        FROM orders WHERE o_orderkey % 3 = 0),
      a AS (
        SELECT o_orderkey, 'A' AS o_orderstatus, o_totalprice,
          2::BIGINT AS version, 'U' AS op
        FROM base WHERE o_orderkey % 21 = 0
        UNION ALL
        SELECT o_orderkey + 200000000, 'N', o_totalprice, 2::BIGINT, 'I'
        FROM base WHERE o_orderkey % 33 = 0),
      s1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, version
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
            ORDER BY version DESC, src DESC) AS rn
          FROM (SELECT *, NULL AS op, 0 AS src FROM base
            UNION ALL SELECT *, 1 AS src FROM a))
        WHERE rn = 1 AND (op IS NULL OR op <> 'D')),
      b AS (
        SELECT o_orderkey, 'B' AS o_orderstatus, o_totalprice,
          3::BIGINT AS version, 'U' AS op
        FROM base WHERE o_orderkey % 12 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, 4::BIGINT, 'D'
        FROM base WHERE o_orderkey % 15 = 0),
      s2 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, version
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
            ORDER BY version DESC, src DESC) AS rn
          FROM (SELECT *, NULL AS op, 0 AS src FROM s1
            UNION ALL SELECT *, 1 AS src FROM b))
        WHERE rn = 1 AND (op IS NULL OR op <> 'D')),
      c AS (
        SELECT o_orderkey, 'C' AS o_orderstatus, o_totalprice,
          3::BIGINT AS version, 'U' AS op
        FROM base WHERE o_orderkey % 30 = 0),
      s4 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, version
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
            ORDER BY version DESC, src DESC) AS rn
          FROM (SELECT *, NULL AS op, 0 AS src FROM s1
            UNION ALL SELECT *, 1 AS src FROM c))
        WHERE rn = 1 AND (op IS NULL OR op <> 'D'))
      SELECT 0::BIGINT AS snapshot_version, * FROM base
      UNION ALL SELECT 1::BIGINT, * FROM s1
      UNION ALL SELECT 2::BIGINT, * FROM s2
      UNION ALL SELECT 3::BIGINT, * FROM s1
      UNION ALL SELECT 4::BIGINT, * FROM s4
      ORDER BY snapshot_version, o_orderkey"""))

  /** Manifest file-statistics data skipping + compaction
    * ([[graft.scale.Versioned.readAtRange]] /
    * [[graft.scale.Versioned.commitCompaction]]): orders range-clustered
    * into 8 files at init (disjoint per-file o_orderkey footer ranges →
    * the manifest is a zone map), then (a) a selective read of v0 served
    * from the PRUNED file list — the builder asserts a strict subset is
    * touched, the oracle certifies the rows are exactly the full filter's
    * — and (b) the same predicate over the v1 COMPACTION commit (8 files
    * bin-packed to 1, history intact). One hash-match certifies pruning
    * loses nothing and compaction is row-exact under time travel.
    */
  private val q226 = GQuery(
    (s, d) => {
      val o = T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .where(col("o_orderkey") % 2 === 0)
      val root = Scratch.fresh("graft_vprune_") + "/orders"
      graft.scale.Versioned.init(s, root,
        o.repartitionByRange(8, col("o_orderkey")))
      val (lo, hi) = (BigDecimal(1000), BigDecimal(9000))
      val all = graft.scale.Versioned.manifestFiles(s, root, 0L)
      val pruned = graft.scale.Versioned.prunedFiles(s, root, 0L,
        "o_orderkey", Some(lo), Some(hi))
      assert(pruned.nonEmpty && pruned.size < all.size,
        s"stats pruning touched ${pruned.size} of ${all.size} files")
      val v1 = graft.scale.Versioned.commitCompaction(s, root, 1L << 30)
      assert(graft.scale.Versioned.manifestFiles(s, root, v1).size < all.size,
        "compaction did not shrink the file count")
      val a = graft.scale.Versioned
        .readAtRange(s, root, 0L, "o_orderkey", Some(lo), Some(hi))
        .withColumn("phase", lit("pruned"))
      val b = graft.scale.Versioned.readLatest(s, root)
        .where(col("o_orderkey").between(1000L, 9000L))
        .withColumn("phase", lit("compacted"))
      a.unionByName(b)
        .select(col("phase"), col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("phase"), col("o_orderkey"))
    },
    Some("""WITH f AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 2 = 0 AND o_orderkey BETWEEN 1000 AND 9000)
      SELECT 'pruned' AS phase, o_orderkey, o_orderstatus, o_totalprice
        FROM f
      UNION ALL
      SELECT 'compacted', o_orderkey, o_orderstatus, o_totalprice FROM f
      ORDER BY phase, o_orderkey"""))

  private val q183 = GQuery(
    (s, d) => {
      val o = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val c = T.customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey"), col("c_acctbal"))
      val aBase = o.where(col("o_orderdate") < "1995-01-01")
      val aDelta = o.where(col("o_orderdate") >= "1995-01-01")
      val bBase = c.where(col("o_custkey") % 3 =!= 0)
      val bDelta = c.where(col("o_custkey") % 3 === 0)
      val stored = aBase.join(bBase, Seq("o_custkey"))
      val out = stored.unionByName(Cdc.joinViewDelta(
        aBase, aDelta, bBase, bDelta, Seq("o_custkey")))
      out.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("string").as("o_orderdate"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey,
        CAST(o_orderdate AS VARCHAR) AS o_orderdate,
        CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey"""))

  def all: Map[String, GQuery] = Map(
    "q90_cdc_upsert" -> q90,
    "q93_scd2_intervals" -> q93,
    "q220_time_travel" -> q220,
    "q226_stats_pruned_read" -> q226,
    "q183_join_view_ivm" -> q183,
  )
}
