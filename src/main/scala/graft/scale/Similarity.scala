package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — queries are broadcast, the corpus
  * scan stays fully distributed, ranking is a per-query window. Cost is
  * O(|corpus| · |queries|) FLOPs with zero corpus shuffle, which is the
  * right baseline even at 100 TB when |queries| is small.
  *
  * Scale path: [[lshBucketTopK]] — random-hyperplane signatures bucket the
  * corpus so each query only scans its bucket (probing the query's own
  * signature); trades recall for a |corpus|/2^bits scan reduction.
  *
  * All math is double precision, summed in array order (left fold) — exact,
  * reproducible results independent of partitioning.
  */
object Similarity {

  /** Element-wise double cast — embeddings are float32 at rest; compute in
    * double for stable, engine-portable results.
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb)).otherwise(lit(0.0))
  }

  /** Contrastive hard-negative mining — the embedding-training-data
    * operator: for each anchor, the k most-similar corpus rows whose
    * `labelCol` DIFFERS from the anchor's (same-class rows are positives,
    * not negatives — the near-miss different-class neighbors are what
    * make contrastive batches hard). Labels can be sources, cluster ids
    * (q97), near-dup components (q41) — any per-row class column.
    *
    * Scale shape: anchors (a training batch — bounded) broadcast; the
    * corpus scan is narrow (one codegen'd cosine per pair); the cut runs
    * through the custom [[graft.plans.TopKPerGroup]] operator, so at most
    * k×|anchors| rows per input partition reach the shuffle and there is
    * no corpus-sized window sort anywhere — unlike the q27 baseline's
    * per-query window, this shape survives an unbounded corpus. Ranking
    * is on the 6dp-ROUNDED similarity (ties then broken by id), making
    * the order an engine-portable contract rather than an ulp accident.
    * Returns (anchor_id, rank, neg_id, sim).
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val a = broadcast(anchors.select(col(idCol).as("anchor_id"),
      toDouble(col(vecCol)).as("__qv"), col(labelCol).as("__alabel")))
    val c = corpus.select(col(idCol).as("neg_id"),
      toDouble(col(vecCol)).as("__cv"), col(labelCol).as("__clabel"))
    val scored = a.join(c, col("__alabel") =!= col("__clabel"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosineNative(col("__qv"), col("__cv")), 6).as("sim"))
    val cut = graft.plans.TopKPerGroup(scored, Seq("anchor_id"),
      Seq(col("sim").desc, col("neg_id").asc), k)
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("sim").desc, col("neg_id").asc)
    cut.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("anchor_id"), col("rank"), col("neg_id"), col("sim"))
  }

  /** Native fused kernel (graft.functions.CosineSimilarity) — bit-identical
    * to [[cosine]] (same accumulation order), one codegen'd loop instead of
    * three intermediate arrays per row.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.cosine_similarity(a, b)

  /** Brute-force cosine top-k: for each row of `queries` (small; broadcast),
    * the k nearest rows of `corpus` by cosine, ties broken by corpus id.
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Random-hyperplane LSH bucket signature: `bits` pseudo-random hyperplanes
    * derived deterministically from (table, plane, dimension) indices (no RNG
    * state — reproducible across runs/engines). sign(dot(v, h_i)) packed to a
    * long. `table` selects an independent hyperplane family for multi-table
    * LSH; table 0 reproduces the original single-table signature.
    */
  def hyperplaneSig(v: Column, dim: Int, bits: Int = 12, table: Int = 0): Column = {
    // h_i[j] in {-1, +1} from a splitmix64-style avalanche of (table, i, j).
    // A linear mix (a·t + b·i + c·j >> k) leaves the sign bits correlated
    // across planes/tables, which measurably depresses multi-table recall;
    // full avalanching makes the hyperplane family effectively random.
    // Reference formulation (tables×bits×dim unrolled terms) — hot paths use
    // the bit-identical fused kernel [[sigsNative]] instead, because janino
    // recompiles the unrolled form per enclosing codegen stage.
    def sgn(i: Int, j: Int): Double =
      graft.functions.NativeExpressions.hyperplaneSign(table, i, j)
    val bitCols = (0 until bits).map { i =>
      val proj = (0 until dim).map { j =>
        element_at(v, j + 1) * lit(sgn(i, j))
      }.reduce(_ + _)
      when(proj > 0, 1L << i).otherwise(0L)
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All per-table signatures at once as array<long> — the native fused
    * kernel (graft.functions.HyperplaneSigs), bit-identical to
    * [[hyperplaneSig]] per table.
    */
  def sigsNative(v: Column, dim: Int, bits: Int, tables: Int): Column =
    graft.functions.NativeExpressions.hyperplane_sigs(v, dim, bits, tables)

  /** Bucketed ANN: corpus and queries hashed to hyperplane buckets; each
    * query joins only its buckets (equi-join shuffle on (table, bucket)),
    * then exact cosine + top-k within the distinct candidates.
    *
    * Recall levers (measured in ScaleSpec on the sf0.01 embeddings, whose
    * top-5 neighbors are WEAK — cosine 0.25-0.49, i.e. the hard case):
    *  - `tables`: independent hyperplane families; corpus is replicated
    *    ×tables (explode), recall ≈ 1-(1-p_table)^tables;
    *  - `multiProbe`: each query additionally probes every flip-1-bit
    *    bucket (QUERY-side only — bits+1 probe keys per table; the corpus
    *    is NOT expanded), rescuing near-misses where exactly one plane
    *    disagreed.
    * Cost per query ≈ tables · probes · n/2^bits candidate rows vs n for
    * brute force; at 100 TB pick `bits` so n/2^bits fits a partition and
    * spend `tables`/`multiProbe` to buy recall back. bits=5, tables=8,
    * multiProbe gives measured recall@5 ≥ 0.9 on the weak-neighbor corpus;
    * tighter corpora (near-dup sims ≥ 0.9) keep that recall at far higher
    * bits. Candidate pairs are deduped on ids BEFORE the exact-cosine
    * verify (narrow shuffle rows; vectors re-attached after, the
    * minhashDupPairs pattern).
    */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 12, tables: Int = 1, multiProbe: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
    // Materialize ALL table signatures as one native-kernel array column
    // BEFORE building the probe structs: inlining the unrolled bits×dim
    // expression per probe (tables × (bits+1) copies) blows the generated
    // method past janino's 64KB limit, and even one unrolled copy per side
    // costs seconds of janino compile per enclosing join stage.
    def withSigs(df: DataFrame, vec: String): DataFrame =
      df.withColumn("__sigs", sigsNative(col(vec), dim, bits, tables))
    // corpus: one (table, bucket) row per table
    val cKeys = withSigs(c, "cv").withColumn("tb", explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), element_at(col("__sigs"), t + 1).as("bucket"))
      }: _*)))
      .select(col("neighbor_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    // queries: per table, the home bucket plus (optionally) all flip-1 probes
    val qKeys = withSigs(q, "qv").withColumn("tb", explode(array((0 until tables).flatMap { t =>
        val sig = element_at(col("__sigs"), t + 1)
        val probes = sig +: (if (multiProbe)
          (0 until bits).map(i => sig.bitwiseXOR(lit(1L << i))) else Seq.empty)
        probes.map(b => struct(lit(t).as("t"), b.as("bucket")))
      }: _*)))
      .select(col("query_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val candidates = qKeys.join(cKeys, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(q, Seq("query_id"))
      .join(c, Seq("neighbor_id"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    * from each query's `kCand` cosine candidates, greedily select
    * `kOut` balancing relevance against redundancy —
    * argmax λ·sim(q, c) − (1−λ)·max_{s∈S} sim(c, s) — the
    * diversity-aware final stage after candidate generation (q27/q82
    * fetch candidates; q149 reranks by relevance alone; THIS trades
    * the near-duplicate tail of a result list for coverage).
    *
    * Fully distributed: no driver state — each of the kOut−1 rounds is
    * a candidate⋈selected join keyed on query_id (both sides
    * ≤ kCand rows per query, so every round is bounded work per query)
    * + one per-query window argmax. λ is a permille integer so the
    * mixing weights are exact decimal literals both engines parse to
    * the same doubles; similarities are the pinned-fold cosine (q27
    * parity); ties break on neighbor_id — the oracle replays every
    * round.
    *
    * Output: (query_id, pos, neighbor_id, rel, max_sim_sel, score) —
    * pos 1 is the pure-relevance seed (null max_sim/score).
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, kCand: Int, kOut: Int,
      lambdaPermille: Int = 700): DataFrame = {
    require(kOut >= 1 && kCand >= kOut, "need kCand >= kOut >= 1")
    require(lambdaPermille > 0 && lambdaPermille < 1000,
      "lambdaPermille in (0, 1000)")
    val lam = lambdaPermille.toDouble / 1000d
    // Both frames are (|queries| × kCand)-bounded; eager local
    // checkpoints cut the round-over-round lineage (each round
    // references the previous selected THREE times — without the
    // freeze the candidate window recomputes 3^round times: measured
    // 15.6 s → 2 s at sf0.1). Same bounded-iteration convention as
    // connectedComponents.
    val candBase = bruteForceTopK(queries, corpus, idCol, vecCol, kCand)
      .join(corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("cv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("sim").as("rel"),
        col("cv"))
      .localCheckpoint(true)
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    var selected = candBase
      .withColumn("rn", row_number().over(w1)).where(col("rn") === 1)
      .select(col("query_id"), col("neighbor_id"), col("rel"), col("cv"),
        lit(1L).as("pos"),
        lit(null).cast("double").as("max_sim_sel"),
        lit(null).cast("double").as("score"))
    for (t <- 2 to kOut) {
      val sel = selected.select(col("query_id"),
        col("neighbor_id").as("sid"), col("cv").as("sv"))
      val rem = candBase.join(
        sel.select(col("query_id"), col("sid").as("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val scored = rem.join(sel, "query_id")
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(first(col("rel")).as("rel"), first(col("cv")).as("cv"),
          max(cosineNative(col("cv"), col("sv"))).as("ms"))
        .withColumn("sc",
          lit(lam) * col("rel") - lit(1.0d - lam) * col("ms"))
      val wt = Window.partitionBy(col("query_id"))
        .orderBy(col("sc").desc, col("neighbor_id"))
      selected = selected.unionByName(scored
        .withColumn("rn", row_number().over(wt)).where(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id"), col("rel"),
          col("cv"), lit(t.toLong).as("pos"),
          col("ms").as("max_sim_sel"), col("sc").as("score")))
        .localCheckpoint(true)
    }
    selected.select(col("query_id"), col("pos"), col("neighbor_id"),
      round(col("rel"), 6).as("rel"),
      round(col("max_sim_sel"), 6).as("max_sim_sel"),
      round(col("score"), 6).as("score"))
  }

  /** Greedy k-center coreset (farthest-point traversal) over an
    * embedding column — the diversity-maximizing data-selection
    * primitive (coreset/active-learning lineage): seed with the
    * smallest id, then k−1 times pick the point FARTHEST (max over
    * points of min cosine distance to the selected set), ties by
    * smallest id. The selected set is the k-bounded driver state
    * (the IVF-centroid contract); each round is ONE distributed
    * argmax pass — k·N distance evaluations total, no pairwise
    * materialization.
    *
    * Determinism: distances are 1 − cosine with the pinned-fold native
    * kernel (the q27 parity shape), the per-point min over ≤k centers
    * is an exact IEEE min, and the argmax orders by (dist desc, id
    * asc) — the oracle replays every round with the identical
    * incremental LEAST chain.
    *
    * Output: (rank, vec_id, sel_dist) — sel_dist is the point's
    * min-distance to the previously selected set at the moment of
    * selection (null for the seed), the classic coverage-radius curve.
    */
  def kCenterCoreset(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = emb.sparkSession
    // try_cast: non-numeric ids become null regardless of the session's
    // ANSI setting, and the require below turns that into one clear
    // message (plain cast would NPE at getLong under non-ANSI, or throw
    // a per-row CAST_INVALID_INPUT mid-plan under ANSI)
    // drop null / non-castable ids BEFORE seeding: orderBy sorts NULLs
    // first, so a single bad id among millions of valid rows would
    // otherwise become the seed and fail the whole call with a message
    // implying the id column as a whole doesn't cast
    val base = emb.select(col(idCol).try_cast("long").as("id"),
      toDouble(col(vecCol)).as("v"))
      .where(col("id").isNotNull)
    val seedRows = base.orderBy(col("id")).limit(1).collect()
    require(seedRows.nonEmpty,
      s"kCenterCoreset: no rows with a non-null long-castable $idCol " +
        s"(input empty, or every $idCol is null / fails try_cast)")
    val seed = seedRows.head
    var selected = List((1, seed.getLong(0),
      Option.empty[Double], seed.getSeq[Double](1)))
    var exhausted = false
    for (t <- 2 to k if !exhausted) {
      val centers = array(selected.map(c => typedLit(c._4)): _*)
      val md = array_min(transform(centers,
        cv => lit(1.0d) - cosineNative(col("v"), cv)))
      val pickRows = base
        .where(!col("id").isInCollection(selected.map(_._2)))
        .select(col("id"), md.as("md"), col("v"))
        .orderBy(col("md").desc, col("id"))
        .limit(1).collect()
      // k > N: every point is already a center — stop with the N-point
      // coreset instead of throwing NoSuchElementException mid-loop
      if (pickRows.isEmpty) exhausted = true
      else {
        val pick = pickRows.head
        selected = selected :+ ((t, pick.getLong(0),
          Some(pick.getDouble(1)), pick.getSeq[Double](2)))
      }
    }
    import spark.implicits._
    selected.map { case (r, id, d, _) =>
      (r.toLong, id, d.map(x =>
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }.toDF("rank", "vec_id", "sel_dist")
  }
}
