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
  *     count rides a broadcast 1-row frame. Beyond ~10 iterations,
  *     localCheckpoint between rounds to cut lineage growth (the
  *     connected-components lesson).
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
  * Semantics: ranks flow along out-edges only; the mass of dangling nodes
  * (no out-edges) is NOT redistributed — their targets simply receive
  * less, and the vector is not re-normalized. That is the cheap, common
  * large-scale variant (redistribution costs a global aggregate per
  * iteration); callers wanting the stochastic-matrix version add the
  * dangling-mass term themselves.
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
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
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
    val last = (1 to iters).foldLeft(init) { (ranks, _) =>
      val contribs = e
        .join(ranks.withColumnRenamed("id", "__rid"),
          col("src") === col("__rid"))
        .join(deg, col("src") === col("__dsrc"))
        .select(col("dst").as("__cid"), expr("__r div __deg").as("__c"))
      val sums = contribs.groupBy(col("__cid"))
        .agg(sum(col("__c")).as("__s"))
      nodes.crossJoin(nRow)
        .join(sums, col("id") === col("__cid"), "left")
        .select(col("id"),
          (expr(s"${teleportUnits}L div __n") +
            expr(s"($dampingPct * coalesce(__s, 0L)) div 100")).as("__r"))
    }
    last.select(col("id"),
      (col("__r").cast("double") / lit(Scale).cast("double")).as("rank"))
  }
}
