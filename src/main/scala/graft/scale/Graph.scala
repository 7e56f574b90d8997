package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics: deterministic PageRank over an edge list.
  *
  * Web-corpus curation ranks hosts/documents by link authority (the
  * Common-Crawl-style quality signal next to the content classifiers in
  * [[Curation]]); the same iteration ranks any entity graph. Completes the
  * graph family next to the connected-components labeling in
  * [[Clustering]].
  *
  * Scale shape (per iteration, a 10^11-edge graph):
  *   - contributions: ranks ⋈ edges on src — at scale, edges are
  *     pre-partitioned (or bucketed, [[Bucketing]]) on src ONCE and every
  *     iteration's join reuses that layout; ranks are #nodes rows of
  *     (id, int64), never payloads;
  *   - the dst aggregation is a map-side-combined BIGINT sum;
  *   - the rank update joins back to the node list (left join, absent =
  *     no in-edges, teleport only). Nothing touches the driver: node
  *     count rides a broadcast 1-row frame. Lineage is truncated in-loop
  *     every `checkpointEvery` iterations (localCheckpoint, or reliable
  *     via `checkpointDir` — the connected-components convention).
  *
  * Determinism contract: ranks are FIXED-POINT integers in units of
  * 10^-12 and every update is integer arithmetic (floor division, exact
  * sums) — the result is bit-identical across engines, partitionings,
  * and replays BY CONSTRUCTION, with no rounding convention to align.
  * Float formulations die on exactly that alignment: damping × (12dp
  * sum) lands within an ulp of decimal rounding boundaries, where
  * Spark's exact BigDecimal rounding and a scaled-multiply double
  * rounding (DuckDB, most C engines) disagree. Floor division loses
  * ≤ 10^-12 per node per iteration — ~10^-9 total mass on a 1000-node
  * graph, far below any ranking use; the emitted double is the exact
  * unit count divided by 10^12 (counts < 2^53 convert exactly).
  *
  * Two variants: [[pageRank]] lets dangling-node mass leak (the cheap,
  * common large-scale form — no global aggregate per iteration);
  * [[pageRankDangling]] redistributes it uniformly each iteration (the
  * stochastic-matrix form — mass-conserving, one extra 1-row broadcast
  * aggregate per iteration).
  */
object Graph {

  /** Unit scale: 1 rank = 10^12 units. 85·SCALE < 2^63, so the damping
    * multiply can never overflow ANSI long arithmetic.
    */
  val Scale: Long = 1000000000000L

  /** `iters` damped PageRank iterations over `edges` (src → dst, duplicate
    * edges should be pre-deduped by the caller if multiplicity is not
    * intended). `dampingPct` is the damping factor in percent (85 = the
    * canonical 0.85) — integer so the fixed-point update stays exact.
    * Returns (id, rank) with rank = exact units / 10^12 as a double.
    *
    * Lineage control for deep iteration counts: every `checkpointEvery`
    * iterations the rank frame's lineage is truncated — `localCheckpoint`
    * (executor-storage blocks; fast, not executor-loss-safe) by default,
    * or a reliable checkpoint when `checkpointDir` names a fault-tolerant
    * directory (the [[Dedup.connectedComponents]] convention; semantics
    * identical, only the recovery story differs). Without truncation each
    * iteration's plan embeds every prior one — at iteration 30 the
    * optimizer re-analyzes a 30-deep join tree and a lost executor
    * recomputes the whole history. `checkpointEvery = 0` disables.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85, checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None): DataFrame =
    iterate(edges, srcCol, dstCol, iters, dampingPct, checkpointEvery,
      checkpointDir, redistributeDangling = false)

  /** The stochastic-matrix PageRank variant: each iteration redistributes
    * the aggregate rank mass of DANGLING nodes (no out-edges) uniformly
    * over all nodes, so total mass is conserved (up to ≤ 10^-12-per-node
    * floor losses) instead of leaking through sinks. Costs exactly one
    * extra global aggregate per iteration — a (1-row) broadcast of the
    * dangling-mass sum — on top of [[pageRank]]'s per-iteration work;
    * same fixed-point integer determinism contract.
    *
    * Update rule per node (all integer, floor division):
    * r' = teleport div n + (damping · (inSum + danglingMass div n)) div 100
    */
  def pageRankDangling(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85, checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None): DataFrame =
    iterate(edges, srcCol, dstCol, iters, dampingPct, checkpointEvery,
      checkpointDir, redistributeDangling = true)

  private def iterate(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int, checkpointEvery: Int,
      checkpointDir: Option[String], redistributeDangling: Boolean): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    val teleportUnits = (Scale / 100L) * (100L - dampingPct)
    // every frame gets globally-disjoint column names: e/deg/nodes share
    // lineage (deg and nodes derive from e), and Spark's ambiguous-self-
    // join check rejects same-name references across derived frames
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // node count as a broadcast 1-row frame — no driver action, no
    // collect; every reference below is a broadcast nested-loop of 1 row
    val nRow = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .withColumnRenamed("src", "__dsrc")
    val init = nodes.crossJoin(nRow)
      .select(col("id"), expr(s"${Scale}L div __n").as("__r"))
    val last = (1 to iters).foldLeft(init) { (ranks, it) =>
      val contribs = e
        .join(ranks.withColumnRenamed("id", "__rid"),
          col("src") === col("__rid"))
        .join(deg, col("src") === col("__dsrc"))
        .select(col("dst").as("__cid"), expr("__r div __deg").as("__c"))
      val sums = contribs.groupBy(col("__cid"))
        .agg(sum(col("__c")).as("__s"))
      val base = nodes.crossJoin(nRow)
        .join(sums, col("id") === col("__cid"), "left")
      val next =
        if (!redistributeDangling)
          base.select(col("id"),
            (expr(s"${teleportUnits}L div __n") +
              expr(s"($dampingPct * coalesce(__s, 0L)) div 100")).as("__r"))
        else {
          // the one extra global aggregate: rank mass sitting on nodes
          // with no out-edges, as a broadcast 1-row frame (no collect)
          val danglRow = broadcast(ranks
            .join(deg, col("id") === col("__dsrc"), "left_anti")
            .agg(coalesce(sum(col("__r")), lit(0L)).as("__dm")))
          base.crossJoin(danglRow)
            .select(col("id"),
              (expr(s"${teleportUnits}L div __n") +
                expr(s"($dampingPct * (coalesce(__s, 0L) + __dm div __n)) " +
                  "div 100")).as("__r"))
        }
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters) {
        if (checkpointDir.isDefined) next.checkpoint(eager = true)
        else next.localCheckpoint(eager = true)
      } else next
    }
    last.select(col("id"),
      (col("__r").cast("double") / lit(Scale).cast("double")).as("rank"))
  }

  /** Canonical undirected edge set from a possibly-directed, possibly-
    * duplicated edge list: self-loops dropped, endpoints ordered a < b,
    * exact-distinct. One narrow projection + one distinct shuffle.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
      least(col(srcCol), col(dstCol)).as("a"),
      greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /** Per-node triangle counts and local clustering coefficient over the
    * canonical undirected edge set of `edges`.
    *
    * Distributed shape (the standard degree-orientation algorithm —
    * Suri & Vassilvitskii's MR triangle counting / "node-iterator++"):
    * orient every undirected edge from its lower-(degree, id) endpoint to
    * the higher one, so each node's OUT-degree is O(√m) regardless of its
    * true degree. Wedges are generated by the oriented self-join on the
    * center (out-neighbor pairs), then closed against the canonical edge
    * set with one more equi-join — each triangle is found exactly once,
    * at its unique minimum-(degree, id) corner. The wedge count — the
    * whole cost — is Σ outdeg² ≤ O(m^1.5) instead of Σ deg² (which a
    * power-law hub would blow up); a 100 TB graph's hottest node
    * contributes only its √m-bounded oriented fan-out. All arithmetic is
    * integer; the coefficient 2T/(d(d−1)) is a single exact-IEEE division
    * of integers, bit-identical across engines.
    *
    * Returns (id, degree, triangles, lcc) — every node of the graph,
    * zero-filled where no triangle touches it.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = canonicalEdges(edges, srcCol, dstCol)
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    // orientation rank: (degree, id) lexicographic — total order, so the
    // oriented graph is acyclic and every triangle has one unique source
    val dl = deg.select(col("id").as("__oid"), col("degree").as("__odeg"))
    val dr = deg.select(col("id").as("__pid"), col("degree").as("__pdeg"))
    val oriented = und
      .join(dl, col("a") === col("__oid"))
      .join(dr, col("b") === col("__pid"))
      .select(
        when(col("__odeg") < col("__pdeg") ||
          (col("__odeg") === col("__pdeg") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges at center u: unordered out-neighbor pairs (v < w by id —
    // any total order works; id keeps the closing join key canonical)
    val o2 = oriented.select(col("u").as("u2"), col("v").as("w"))
    val wedges = oriented.join(o2, col("u") === col("u2"))
      .where(col("v") < col("w"))
      .select(col("u"), col("v"), col("w"))
    val closed = wedges.join(und,
      col("v") === col("a") && col("w") === col("b"))
      .select(col("u"), col("v"), col("w"))
    val perNode = closed
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          (col("triangles") * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** `iters` rounds of SYNCHRONOUS label propagation (community
    * detection) over the undirected graph of `edges`. Seed label = own
    * id; each round every node adopts the most frequent label among its
    * neighbors, ties broken toward the SMALLEST label — a total,
    * engine-portable rule (no hash-order or visit-order dependence, the
    * nondeterminism that makes vanilla async LPA unreproducible).
    * Neighbor-less nodes cannot occur (edges are symmetrized and
    * self-loops dropped), but isolated inputs would keep their seed via
    * the left join.
    *
    * Scale shape: per round ONE join of the directed (2m-row) edge list
    * against the label frame + one (node, label) count aggregate + one
    * per-node arg-max — all keyed shuffles on node id, map-side
    * combinable. Deep rounds inherit [[pageRank]]'s lineage story —
    * `checkpointEvery` truncates in-loop. Hot nodes: the count aggregate
    * pre-collapses a hub's incident edges to ≤ (distinct neighbor
    * labels) rows before the arg-max, so a 10^8-degree node costs its
    * label diversity, not its degree, past the first combine.
    *
    * Returns (id, label, csize) — final label and its community size.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "labelPropagation needs at least one iteration")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    val und = canonicalEdges(edges, srcCol, dstCol)
    val dir = und.select(col("a").as("n"), col("b").as("m"))
      .union(und.select(col("b").as("n"), col("a").as("m")))
    val nodes = dir.select(col("n").as("id")).distinct()
    val init = nodes.select(col("id"), col("id").as("lbl"))
    val last = (1 to iters).foldLeft(init) { (labels, it) =>
      val nbr = dir.join(labels.withColumnRenamed("id", "__lid"),
        col("m") === col("__lid"))
        .groupBy(col("n"), col("lbl")).agg(count(lit(1)).as("__c"))
      // arg-max by (count, -label): max count, tie -> smallest label
      val picked = nbr.groupBy(col("n"))
        .agg(max(struct(col("__c"), (-col("lbl")).as("__nl"))).as("__m"))
        .select(col("n").as("id"), (-col("__m.__nl")).as("lbl"))
      val next = nodes.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
      if (checkpointEvery > 0 && it % checkpointEvery == 0 && it < iters) {
        if (checkpointDir.isDefined) next.checkpoint(eager = true)
        else next.localCheckpoint(eager = true)
      } else next
    }
    val sizes = last.groupBy(col("lbl")).agg(count(lit(1)).as("csize"))
    last.join(sizes, "lbl").select(col("id"), col("lbl").as("label"), col("csize"))
  }
}
