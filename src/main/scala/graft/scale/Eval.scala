package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/ranking evaluation metrics over pre-quantized scores — the
  * "did the classifier / retriever / filter actually work" leg every
  * training-data pipeline runs after curation (beyond the reference —
  * its ML leg stops at scoring, `test.py:477`; a corpus pipeline also
  * has to grade the scorers it gates documents with).
  *
  * Design rules shared by the family:
  *   - scores arrive as INTEGER units (the caller picks the resolution,
  *     e.g. permille) — the metric state then collapses from O(rows) to
  *     O(distinct units) per group BEFORE any ordered pass, so the
  *     windows below run over ≤ resolution-sized frames no matter how
  *     many billions of rows were scored;
  *   - every metric is an exact integer statistic divided once at the
  *     end (AUC, KS, kappa) or a fixed-order IEEE fold (NDCG) — the
  *     oracle replays the same integers and the same fold order, so a
  *     hash-match certifies the arithmetic, not a tolerance;
  *   - nothing collects to the driver; outputs are one row per group /
  *     query / class.
  */
object Eval {

  /** Exact tie-aware ROC-AUC per group.
    *
    * AUC = P(score⁺ > score⁻) + ½P(score⁺ = score⁻) over all
    * positive/negative pairs — the Mann-Whitney U statistic. Computed
    * on the (group, units) contingency collapse:
    *
    *   numer2 = Σ_v pos_v · (2·negBelow_v + neg_v),  AUC = numer2 / (2·P·N)
    *
    * all in int64 (numer2 ≤ 2PN ≤ 2·(rows/2)² — overflow needs ~3·10⁹
    * rows in ONE group at which point the caller shards the group), one
    * double division at the end. The prefix sum runs per group over the
    * distinct-unit frame (≤ score resolution rows), never over raw rows
    * — the 100 TB shape: a billion scored docs collapse to ≤1001 rows
    * per group before the window.
    *
    * Degenerate groups (no positives or no negatives) report a null AUC
    * rather than a divide-by-zero.
    */
  def binaryAuc(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column): DataFrame =
    binaryAucFromContingency(
      scoreContingency(df, groupCol, unitsCol, labelCol))

  /** The mergeable state behind [[binaryAuc]]/[[calibrationError]]: the
    * (group, unit) → (n, pos) contingency table. Additive under
    * [[contingencyMerge]] (element-wise sum on matching keys), which is
    * what makes AUC/ECE maintainable from a stream or across shards
    * without ever re-reading scores — the same persisted-sketch
    * contract as HLL/CMS/histogram (exactly-once transport required;
    * a re-delivered batch double-counts).
    */
  def scoreContingency(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column): DataFrame =
    df.select(groupCol.as("g"), unitsCol.cast("long").as("u"),
        labelCol.cast("long").as("y"))
      .groupBy(col("g"), col("u"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))

  /** Element-wise sum of two contingency tables (missing keys = 0). */
  def contingencyMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("g"), col("u"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))

  /** Finalize a [[scoreContingency]] table to per-group AUC — runs over
    * ≤ resolution rows per group, so it answers from the persisted
    * state table alone.
    */
  def binaryAucFromContingency(contingency: DataFrame): DataFrame = {
    val per = contingency.withColumn("neg", col("n") - col("pos"))
    val below = Window.partitionBy(col("g")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("negBelow", coalesce(sum(col("neg")).over(below), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("negBelow") + col("neg")))
          .as("numer2"))
      .select(col("g").as("group"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("numer2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), 6)).as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group.
    *
    * D = max_v |F_a(v) − F_b(v)| over the pooled distinct values;
    * computed as the integer numerator max_v |n_b·C_a(v) − n_a·C_b(v)|
    * (C = inclusive cumulative count) so the max is taken over exact
    * int64 — no double comparisons steer the answer; the single division
    * happens after the max. Same collapsed-units scaling story as
    * [[binaryAuc]]: the ordered pass sees distinct units, not rows.
    *
    * `sideCol` must be a boolean column — true rows form sample A,
    * false rows sample B. Groups missing a side report null D.
    */
  def ksStatistic(df: DataFrame, groupCol: Column, unitsCol: Column,
      sideCol: Column): DataFrame = {
    val per = df
      .select(groupCol.as("g"), unitsCol.cast("long").as("u"),
        sideCol.cast("long").as("a"))
      .groupBy(col("g"), col("u"))
      .agg(sum(col("a")).as("na_v"),
        (count(lit(1)) - sum(col("a"))).as("nb_v"))
    val upTo = Window.partitionBy(col("g")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("ca", sum(col("na_v")).over(upTo))
      .withColumn("cb", sum(col("nb_v")).over(upTo))
      .withColumn("ta", sum(col("na_v")).over(whole))
      .withColumn("tb", sum(col("nb_v")).over(whole))
      .groupBy(col("g"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(abs(col("tb") * col("ca") - col("ta") * col("cb")))
          .as("d_num"))
      .select(col("g").as("group"), col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6)).as("d"))
  }

  /** Per-query ranking metrics — reciprocal rank, recall@k, NDCG@k — of
    * a run table (qid, doc, rank) against a graded gold table
    * (qid, doc, grade ≥ 1). One row per gold query; queries the system
    * returned nothing for score 0 (not dropped — silent misses are the
    * bug this operator exists to surface).
    *
    * Determinism: DCG/IDCG are IEEE sums of grade/log2(pos+1) terms —
    * order-sensitive — so both are folded in EXPLICIT ascending-position
    * order over an array (`aggregate` over a rank-sorted `collect_list`,
    * the q92/c-TF-IDF discipline; the oracle replays with `list_reduce`
    * over `list(... ORDER BY rank)`). RR and recall are exact rationals
    * rounded once.
    *
    * Scale shape: one (q, doc) hash join (runs are pre-truncated to
    * rank ≤ k, so the run side is ≤ k rows per query by contract), one
    * groupBy q with ≤ k array elements per group, and the IDCG side
    * bounds its per-query state to k rows via a (grade desc, doc) window
    * BEFORE collecting — a query with a million gold docs still folds k
    * terms. No driver state at all.
    */
  def rankingEval(runs: DataFrame, gold: DataFrame, qCol: String,
      docCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    val r = runs.select(col(qCol).as("q"), col(docCol).as("doc"),
        col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
    val g = gold.select(col(qCol).as("q"), col(docCol).as("doc"),
      col(gradeCol).cast("long").as("grade"))
    val perRun = r.join(g, Seq("q", "doc"), "left")
      .withColumn("rel", coalesce(col("grade"), lit(0L)))
      .groupBy(col("q"))
      .agg(
        min(when(col("rel") > 0L, col("rank"))).as("first_hit"),
        sum((col("rel") > 0L).cast("long")).as("hits"),
        aggregate(
          transform(
            array_sort(collect_list(struct(col("rank"), col("rel")))),
            x => x.getField("rel").cast("double") /
              log2(x.getField("rank").cast("double") + 1d)),
          lit(0.0d), (a, x) => a + x).as("dcg"))
    val topGold = g
      .withColumn("pos", row_number().over(Window.partitionBy(col("q"))
        .orderBy(col("grade").desc, col("doc"))))
      .where(col("pos") <= k)
    val perGold = g.groupBy(col("q")).agg(count(lit(1)).as("n_gold"))
      .join(
        topGold.groupBy(col("q")).agg(
          aggregate(
            transform(
              array_sort(collect_list(struct(col("pos"), col("grade")))),
              x => x.getField("grade").cast("double") /
                log2(x.getField("pos").cast("double") + 1d)),
            lit(0.0d), (a, x) => a + x).as("idcg")),
        Seq("q"))
    perGold.join(perRun, Seq("q"), "left")
      .select(col("q").as("qid"), col("n_gold"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(lit(1.0d) / col("first_hit").cast("double"),
          lit(0.0d)), 6).as("rr"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_gold").cast("double"), 6).as("recall"),
        round(coalesce(col("dcg"), lit(0.0d)) / col("idcg"), 6).as("ndcg"))
  }

  /** Cohen's kappa inter-annotator agreement per group — the
    * label-quality gate before any labeled subset enters training.
    *
    * κ = (n·Σnᵢᵢ − Σrᵢcᵢ) / (n² − Σrᵢcᵢ): every term is an int64 count
    * product (marginal products ≤ n², safe to ~3·10⁹ rows per group),
    * ONE double division at the end. Degenerate groups (chance
    * agreement = 1, i.e. both annotators constant) report null κ.
    *
    * Plan: one (group, a, b) contingency aggregate — the only pass over
    * the data — then marginal re-aggregates over the CELL table (≤
    * |labels|² rows per group, not rows of data). Categories one
    * annotator never used contribute 0 to Σrᵢcᵢ, which the inner
    * marginal join reproduces by dropping them.
    */
  def cohenKappa(df: DataFrame, groupCol: Column, aCol: Column,
      bCol: Column): DataFrame = {
    val cells = df
      .select(groupCol.as("g"), aCol.as("a"), bCol.as("b"))
      .groupBy(col("g"), col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("g")).agg(
      sum(col("n")).as("n_rows"),
      sum(when(col("a") === col("b"), col("n")).otherwise(0L))
        .as("agree"))
    val rows = cells.groupBy(col("g"), col("a")).agg(sum(col("n")).as("ra"))
    val cols = cells.groupBy(col("g"), col("b")).agg(sum(col("n")).as("cb"))
    val pe = rows.join(cols,
        rows("g") === cols("g") && rows("a") === cols("b"))
      .groupBy(rows("g").as("g"))
      .agg(sum(col("ra") * col("cb")).as("pe_num"))
    totals.join(pe, Seq("g"), "left")
      .select(col("g").as("group"), col("n_rows"), col("agree"),
        coalesce(col("pe_num"), lit(0L)).as("pe_num"),
        round(col("agree").cast("double") / col("n_rows").cast("double"),
          6).as("agree_rate"),
        when(col("n_rows") * col("n_rows") =!=
            coalesce(col("pe_num"), lit(0L)),
          round((col("n_rows") * col("agree") - coalesce(col("pe_num"),
              lit(0L))).cast("double") /
            (col("n_rows") * col("n_rows") - coalesce(col("pe_num"),
              lit(0L))).cast("double"), 6)).as("kappa"))
  }

  /** χ² feature selection: the topK terms most associated with each
    * label by the 2×2 doc-presence contingency test — the
    * "what vocabulary separates this source / this quality band"
    * operator behind classifier-based curation (and the c-TF-IDF
    * label summaries of q129, with test statistics instead of scores).
    *
    * Candidates are the terms PRESENT in the label (a ≥ 1): a term the
    * label never uses scores pure anti-association — which is exactly
    * some other label's positive story, and shows up there.
    *
    * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). ad−bc stays int64
    * (marginal products ≤ N²/4 — exact to N ≈ 3·10⁹ docs); the square
    * and the ratio are IEEE with ONE canonical parenthesization
    * replayed verbatim by the oracle, so ordering by χ² is
    * engine-stable. Ranking is total: (χ² desc, term asc).
    *
    * Plan: explode → per-(label, doc, term) distinct (presence, not
    * frequency) → (label, term) counts → term totals re-aggregated from
    * THAT frame (no second corpus pass) → broadcast label sizes → one
    * window top-k over the label's candidate terms. `minDf` prunes the
    * hapax tail before the window sort.
    */
  def chiSquareTerms(docs: DataFrame, labelCol: Column, idCol: Column,
      textCol: Column, topK: Int, minDf: Long): DataFrame = {
    val pres = docs
      .select(labelCol.as("lbl"), idCol.as("id"),
        explode(TextOps.tokens(textCol)).as("term"))
      .distinct()
    val lt = pres.groupBy(col("lbl"), col("term"))
      .agg(count(lit(1)).as("a_cnt"))
    val tf = lt.groupBy(col("term")).agg(sum(col("a_cnt")).as("tf"))
      .where(col("tf") >= minDf)
    val sizes = docs.select(labelCol.as("lbl"), idCol.as("id")).distinct()
      .groupBy(col("lbl")).agg(count(lit(1)).as("nl"))
    val nTotal = sizes.agg(sum(col("nl")).as("n_docs"))
    val scored = lt.join(tf, "term")
      .join(broadcast(sizes), "lbl")
      .crossJoin(broadcast(nTotal))
      .withColumn("b_cnt", col("nl") - col("a_cnt"))
      .withColumn("c_cnt", col("tf") - col("a_cnt"))
      .withColumn("d_cnt",
        col("n_docs") - col("nl") - col("tf") + col("a_cnt"))
      .withColumn("det",
        (col("a_cnt") * col("d_cnt") - col("b_cnt") * col("c_cnt"))
          .cast("double"))
      .withColumn("chi2",
        // A term present in every document (tf == n_docs) or a corpus
        // with a single label (nl == n_docs) zeroes the denominator and
        // 0/0 = NaN, which Spark sorts as LARGEST — such degenerate
        // terms carry no association signal, so their chi2 is 0.
        when(col("tf") < col("n_docs") && col("nl") < col("n_docs"),
          (col("n_docs").cast("double") * (col("det") * col("det"))) /
            ((col("nl").cast("double") *
              (col("n_docs") - col("nl")).cast("double")) *
             (col("tf").cast("double") *
              (col("n_docs") - col("tf")).cast("double"))))
          .otherwise(lit(0.0d)))
    scored
      .withColumn("pos", row_number().over(Window.partitionBy(col("lbl"))
        .orderBy(col("chi2").desc, col("term"))))
      .where(col("pos") <= topK)
      .select(col("lbl").as("label"), col("pos").cast("long").as("pos"),
        col("term"),
        col("a_cnt").as("df_label"), col("tf").as("df_all"),
        round(col("chi2"), 6).as("chi2"))
  }

  /** Pairwise Jensen–Shannon divergence between the groups' unigram
    * token distributions — the symmetric, bounded ([0, ln 2]) corpus
    * drift measure (embedding-space drift is q130; this is its
    * token-space twin, the one that works before any encoder exists).
    *
    * Decomposition that avoids materializing the union vocabulary per
    * pair: terms one side lacks contribute exactly ½·ln2·(their mass),
    * so  JSD = ½ln2·(2 − Sp − Sq) + ½·Σ_shared[p·ln(2p/(p+q)) +
    * q·ln(2q/(p+q))]  where Sp/Sq are the SHARED-mass fractions — only
    * the vocabulary INTERSECTION is ever joined, and its per-pair term
    * frame collapses to (x, y) count-multiplicity rows (the q163
    * discipline). Each multiplicity row's contribution is quantized to
    * integer pico-units and summed in int64, so the shared sum is exact
    * and partition-order-independent; ROUND(…, 6) on the final value is
    * cosmetic, not load-bearing.
    *
    * Scale: the term self-join is keyed on term (hash-partitioned); per
    * pair state after the multiplicity collapse is bounded by distinct
    * (x, y) count pairs — Zipf corpora keep that tiny relative to the
    * vocabulary. Totals are a broadcast |groups|-row frame.
    */
  def jsDivergence(docs: DataFrame, srcCol: Column,
      textCol: Column): DataFrame = {
    val ln2 = math.log(2.0)
    val tc = docs
      .select(srcCol.as("src"), explode(TextOps.tokens(textCol)).as("t"))
      .groupBy(col("src"), col("t")).agg(count(lit(1)).as("c"))
    val tot = tc.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val shared = tc.select(col("src").as("sa"), col("t"), col("c").as("x"))
      .join(tc.select(col("src").as("sb"), col("t"), col("c").as("y")),
        "t")
      .where(col("sa") < col("sb"))
    val mult = shared.groupBy(col("sa"), col("sb"), col("x"), col("y"))
      .agg(count(lit(1)).as("m"))
    val withTot = mult
      .join(broadcast(tot.select(col("src").as("sa"),
        col("n").as("na"))), "sa")
      .join(broadcast(tot.select(col("src").as("sb"),
        col("n").as("nb"))), "sb")
    val p = col("x").cast("double") / col("na").cast("double")
    val q = col("y").cast("double") / col("nb").cast("double")
    // Each (x, y)-multiplicity contribution is quantized ONCE to integer
    // pico-units (round(1e12·f); f ≥ 0 by convexity and the pair total is
    // ≤ 2·ln2·1e12 ≈ 1.4e12, safely int64 under ANSI) so the shared-mass
    // sum is exact int64 arithmetic independent of partition/sum order —
    // the Lm.knBigramCrossEntropy discipline. A last-ulp ln() disagreement
    // between engines moves f·1e12 by ~1e-10, absorbed by the rounding.
    val fTerm = p * log(lit(2.0d) * p / (p + q)) +
      q * log(lit(2.0d) * q / (p + q))
    val contribU = col("m") * round(lit(1.0e12d) * fTerm).cast("long")
    val sharedAgg = withTot.groupBy(col("sa"), col("sb")).agg(
      sum(col("m")).as("shared_terms"),
      sum(col("m") * col("x")).as("sx"),
      sum(col("m") * col("y")).as("sy"),
      sum(contribU).as("sc_u"))
    val pairs = tot.select(col("src").as("sa"), col("n").as("na"))
      .crossJoin(broadcast(tot.select(col("src").as("sb"),
        col("n").as("nb"))))
      .where(col("sa") < col("sb"))
    val jsd = lit(ln2 / 2.0d) *
      ((lit(1.0d) - coalesce(col("sx"), lit(0L)).cast("double") /
          col("na").cast("double")) +
       (lit(1.0d) - coalesce(col("sy"), lit(0L)).cast("double") /
          col("nb").cast("double"))) +
      coalesce(col("sc_u"), lit(0L)).cast("double") / lit(2.0e12d)
    pairs.join(sharedAgg, Seq("sa", "sb"), "left")
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        coalesce(col("shared_terms"), lit(0L)).as("shared_terms"),
        round(jsd, 6).as("jsd"),
        round(jsd / lit(ln2), 6).as("jsd_norm"))
  }

  /** Precision/recall curve per group: one row per DISTINCT score unit
    * (threshold = "predict positive at score ≥ u"), with exact int64
    * TP/FP/FN counts from descending prefix sums over the same
    * collapsed-units frame as [[binaryAuc]] — the full operating-point
    * table a threshold picker reads, at ≤ resolution rows per group.
    * precision/recall/F1 are single exact divisions per row (F1 as
    * 2TP/(2TP+FP+FN) — one division, not a mean of two ratios).
    */
  def prCurve(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column): DataFrame = {
    val per = df
      .select(groupCol.as("g"), unitsCol.cast("long").as("u"),
        labelCol.cast("long").as("y"))
      .groupBy(col("g"), col("u"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val fromHere = Window.partitionBy(col("g")).orderBy(col("u").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("tp", sum(col("pos")).over(fromHere))
      .withColumn("fp", sum(col("neg")).over(fromHere))
      .withColumn("p_tot", sum(col("pos")).over(whole))
      .withColumn("fn", col("p_tot") - col("tp"))
      .select(col("g").as("group"), col("u").as("threshold_unit"),
        col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0L,
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6)).as("precision"),
        when(col("p_tot") > 0L,
          round(col("tp").cast("double") / col("p_tot").cast("double"),
            6)).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          round((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"),
            6)).as("f1"))
  }

  /** Expected calibration error per group over `bins` equal-width score
    * bins (scores as permille units in [0, 1000)). The weighted
    * |accuracy − confidence| sum telescopes to PURE int64:
    *
    *   ECE = Σ_b (n_b/N)·|pos_b/n_b − su_b/(1000·n_b)|
    *       = (Σ_b |1000·pos_b − su_b|) / (1000·N)
    *
    * so the entire statistic is one absolute-difference sum over the
    * ≤ bins-row frame and ONE division — no per-bin float means at all
    * (the per-bin reliability diagram itself is q168's output).
    */
  def calibrationError(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column, bins: Int): DataFrame = {
    val b = least(greatest(
      floor(unitsCol.cast("double") / 1000d * bins).cast("long"), lit(0L)),
      lit(bins.toLong - 1L))
    val per = df
      .select(groupCol.as("g"), b.as("bin"),
        unitsCol.cast("long").as("u"), labelCol.cast("long").as("y"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("u")).as("su"))
    per.groupBy(col("g"))
      .agg(sum(col("n")).as("n_rows"),
        sum(abs(lit(1000L) * col("pos") - col("su"))).as("dev_num"))
      .select(col("g").as("group"), col("n_rows"), col("dev_num"),
        round(col("dev_num").cast("double") /
          (lit(1000L) * col("n_rows")).cast("double"), 6).as("ece"))
  }

  /** McNemar's paired test per group: is classifier B actually better
    * than classifier A, on the SAME rows? Only the discordant counts
    * matter — b = A right/B wrong, c = A wrong/B right — and the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) is int64 algebra
    * with one division (null when b = c = 0: no evidence either way).
    * The whole reduction is a single combinable aggregate; accuracies
    * ride along for the report.
    */
  def mcnemar(df: DataFrame, groupCol: Column, labelCol: Column,
      predACol: Column, predBCol: Column): DataFrame = {
    val aOk = (predACol === labelCol).cast("long")
    val bOk = (predBCol === labelCol).cast("long")
    df.select(groupCol.as("g"), aOk.as("ao"), bOk.as("bo"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("ao")).as("a_correct"),
        sum(col("bo")).as("b_correct"),
        sum(col("ao") * (lit(1L) - col("bo"))).as("b_disc"),
        sum((lit(1L) - col("ao")) * col("bo")).as("c_disc"))
      .select(col("g").as("group"), col("n"),
        col("a_correct"), col("b_correct"), col("b_disc"), col("c_disc"),
        round(col("a_correct").cast("double") / col("n").cast("double"),
          6).as("acc_a"),
        round(col("b_correct").cast("double") / col("n").cast("double"),
          6).as("acc_b"),
        when(col("b_disc") + col("c_disc") > 0L,
          round(((abs(col("b_disc") - col("c_disc")) - lit(1L)) *
                 (abs(col("b_disc") - col("c_disc")) - lit(1L)))
              .cast("double") /
            (col("b_disc") + col("c_disc")).cast("double"), 6))
          .as("chi2_cc"))
  }

  /** Per-group selection/error-rate audit of a binary gate against a
    * protected attribute — selection rate, TPR, FPR per group plus the
    * disparate-impact ratio vs the OVERALL rate, computed as the exact
    * integer cross-product sel_g·n_all / (n_g·sel_all) with one
    * division. The group frame is |groups| rows; the overall row is a
    * broadcast 1-row stat frame (the suite-wide crossJoin idiom).
    */
  /** Cumulative gains / lift table per group at `buckets` cuts over the
    * score distribution — the "how much better than random is the top
    * decile" operating view behind every targeting/curation threshold
    * choice (ROC answers ranking quality; THIS answers "if I keep the
    * top 10/20/…% by score, what fraction of positives do I capture").
    *
    * Runs entirely on the [[scoreContingency]] collapse (≤ resolution
    * rows per group — the 100 TB shape), so it is maintainable from the
    * same persisted/streamed state as AUC/ECE. Ties are handled by
    * fractional interpolation inside the straddling score unit (the
    * tie-aware convention, mirroring the trapezoidal AUC): cut k takes
    * exactly k·N/buckets rows, with a tied unit contributing
    * proportional positive mass. All boundary arithmetic is exact int64
    * (k·N vs buckets·cumrows — no float steers WHICH unit straddles);
    * the fractional mass is ONE division per output row.
    *
    * Output per (group, bucket k): cum_pos (tie-interpolated positives
    * in the top k/buckets fraction), gain = cum_pos / total positives,
    * lift = gain / (k/buckets).
    */
  def liftTable(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column, buckets: Int = 10): DataFrame =
    liftTableFromContingency(
      scoreContingency(df, groupCol, unitsCol, labelCol), buckets)

  /** Finalize a [[scoreContingency]] table to the per-group lift table —
    * answers from the persisted state alone.
    */
  def liftTableFromContingency(contingency: DataFrame,
      buckets: Int = 10): DataFrame = {
    val b = lit(buckets.toLong)
    val above = Window.partitionBy(col("g")).orderBy(col("u").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = contingency
      .withColumn("rows_above", coalesce(sum(col("n")).over(above), lit(0L)))
      .withColumn("pos_above", coalesce(sum(col("pos")).over(above), lit(0L)))
    val tot = contingency.groupBy(col("g"))
      .agg(sum(col("n")).as("nn"), sum(col("pos")).as("np"))
    // Each cut k lands in exactly ONE unit: the half-open row intervals
    // (b·rows_above, b·(rows_above+n)] partition (0, b·N] and k·N is in
    // it. The explode is over the COLLAPSED contingency (≤ resolution
    // rows/group), so the ×buckets expansion is bounded state, not data.
    val expanded = pre.join(broadcast(tot), "g")
      .select(col("g"), col("n"), col("pos"), col("rows_above"),
        col("pos_above"), col("nn"), col("np"),
        explode(sequence(lit(1L), b)).as("k"))
      .where(col("rows_above") * b < col("k") * col("nn") &&
        col("k") * col("nn") <= (col("rows_above") + col("n")) * b)
    val mB = col("k") * col("nn") - col("rows_above") * b
    val cumPos = col("pos_above").cast("double") +
      mB.cast("double") * col("pos").cast("double") /
        (b.cast("double") * col("n").cast("double"))
    expanded.select(col("g").as("group"), col("k").as("bucket"),
      col("nn").as("n_rows"), col("np").as("n_pos"),
      round(cumPos, 6).as("cum_pos"),
      when(col("np") > 0L,
        round(cumPos / col("np").cast("double"), 6)).as("gain"),
      when(col("np") > 0L,
        round(cumPos * b.cast("double") /
          (col("np").cast("double") * col("k").cast("double")), 6))
        .as("lift"))
  }

  /** Per-label top-k terms by mutual information I(term; label) over the
    * document-presence contingency — χ²'s information-theoretic twin
    * (q175 asks "associated at all?"; MI asks "how many nats does
    * observing the term buy about the label").
    *
    * I = Σ_cell (cnt/N)·ln(N·cnt/(row·col)) over the 2×2 presence table;
    * empty cells contribute 0 (the x·ln x → 0 limit), and a non-empty
    * cell's marginals are ≥ its count, so no 0/0 exists by construction.
    * Each cell term is quantized ONCE to integer pico-units
    * (round(1e12·f), |f| ≤ ln N — int64-safe) and the 4-cell sum is
    * int64, so the RANKING key is exact integer arithmetic — unlike a
    * float sum, tie order can't depend on evaluation order. Ranking is
    * total: (mi desc, term asc). Same plan shape as [[chiSquareTerms]]:
    * one presence pass, term totals re-aggregated, broadcast label
    * sizes, one bounded window.
    */
  def mutualInfoTerms(docs: DataFrame, labelCol: Column, idCol: Column,
      textCol: Column, topK: Int, minDf: Long): DataFrame = {
    def cellU(cnt: Column, rowm: Column, colm: Column, n: Column): Column =
      when(cnt > 0L,
        round(lit(1.0e12d) * (cnt.cast("double") / n.cast("double")) *
          log(n.cast("double") * cnt.cast("double") /
            (rowm.cast("double") * colm.cast("double")))).cast("long"))
        .otherwise(lit(0L))
    val pres = docs
      .select(labelCol.as("lbl"), idCol.as("id"),
        explode(TextOps.tokens(textCol)).as("term"))
      .distinct()
    val lt = pres.groupBy(col("lbl"), col("term"))
      .agg(count(lit(1)).as("a_cnt"))
    val tf = lt.groupBy(col("term")).agg(sum(col("a_cnt")).as("tf"))
      .where(col("tf") >= minDf)
    val sizes = docs.select(labelCol.as("lbl"), idCol.as("id")).distinct()
      .groupBy(col("lbl")).agg(count(lit(1)).as("nl"))
    val nTotal = sizes.agg(sum(col("nl")).as("n_docs"))
    val n = col("n_docs")
    val scored = lt.join(tf, "term")
      .join(broadcast(sizes), "lbl")
      .crossJoin(broadcast(nTotal))
      .withColumn("mi_u",
        cellU(col("a_cnt"), col("tf"), col("nl"), n) +
        cellU(col("nl") - col("a_cnt"), n - col("tf"), col("nl"), n) +
        cellU(col("tf") - col("a_cnt"), col("tf"), n - col("nl"), n) +
        cellU(n - col("nl") - col("tf") + col("a_cnt"),
          n - col("tf"), n - col("nl"), n))
    scored
      .withColumn("pos", row_number().over(Window.partitionBy(col("lbl"))
        .orderBy(col("mi_u").desc, col("term"))))
      .where(col("pos") <= topK)
      .select(col("lbl").as("label"), col("pos").cast("long").as("pos"),
        col("term"),
        col("a_cnt").as("df_label"), col("tf").as("df_all"),
        round(col("mi_u").cast("double") / lit(1.0e12d), 6).as("mi"))
  }

  /** Population Stability Index of each group's binned score
    * distribution against the POOLED corpus — the industry-standard
    * "did this slice drift from the profile we validated" monitor
    * (PSI < 0.1 stable / 0.1–0.25 watch / > 0.25 act), completing the
    * drift family: KS (q172) is distribution-free per unit, JSD (q176)
    * is token-space, THIS is the binned, thresholded operations view.
    *
    * PSI = Σ_b (a_b/A − e_b/E)·ln((a_b/A)/(e_b/E)) with Laplace +1 on
    * both sides of every pooled-present bin (the continuous zero-cell
    * adjustment — a bin one side lacks stays finite). Each bin term is
    * ≥ 0 (same-sign factors) and quantized ONCE to integer pico-units;
    * the per-group sum is int64 over ≤ `bins` cells. Convention: bins
    * empty in the POOLED corpus are EXCLUDED from the smoothed sum
    * (not gridded) — under smoothing such a bin would contribute a
    * small nonzero (1/(A+bins) − 1/(E+bins))·ln-ratio term whenever
    * group and pool sizes differ, so omitting it is a deliberate
    * convention (the DuckDB oracle replays the same one), not an
    * identity; the `+bins` denominators likewise smooth all `bins`
    * nominal cells while only pooled-present cells are summed.
    *
    * Plan: one (group, bin) count pass; the global/bin and group-total
    * frames re-aggregate it; the group×bin grid is |groups|·bins rows
    * of broadcast-joined state — nothing rescans the corpus.
    */
  def psiVsGlobal(df: DataFrame, groupCol: Column, unitsCol: Column,
      bins: Int = 10): DataFrame = {
    val b = least(greatest(
      floor(unitsCol.cast("double") / 1000d * bins).cast("long"), lit(0L)),
      lit(bins.toLong - 1L))
    val act = df.select(groupCol.as("g"), b.as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("a"))
    psiFromBinned(act, bins)
  }

  /** Finalize a persisted/streamed [[scoreContingency]] table to the
    * per-group PSI — same state, zero extra maintenance (the q187
    * contract). Bins the contingency's score units exactly as
    * [[psiVsGlobal]] bins raw units.
    */
  def psiVsGlobalFromContingency(contingency: DataFrame,
      bins: Int = 10): DataFrame = {
    val b = least(greatest(
      floor(col("u").cast("double") / 1000d * bins).cast("long"),
      lit(0L)), lit(bins.toLong - 1L))
    psiFromBinned(contingency.select(col("g"), b.as("bin"), col("n"))
      .groupBy(col("g"), col("bin")).agg(sum(col("n")).as("a")), bins)
  }

  private def psiFromBinned(act: DataFrame, bins: Int): DataFrame = {
    val glob = act.groupBy(col("bin")).agg(sum(col("a")).as("e"))
    val totA = act.groupBy(col("g")).agg(sum(col("a")).as("ta"))
    val totE = glob.agg(sum(col("e")).as("te"))
    val cells = totA.crossJoin(broadcast(glob))
      .join(act, Seq("g", "bin"), "left")
      .withColumn("a0", coalesce(col("a"), lit(0L)))
      .crossJoin(broadcast(totE))
    val ar = (col("a0") + 1L).cast("double") /
      (col("ta") + lit(bins.toLong)).cast("double")
    val er = (col("e") + 1L).cast("double") /
      (col("te") + lit(bins.toLong)).cast("double")
    val termU = round(lit(1.0e12d) * ((ar - er) * log(ar / er)))
      .cast("long")
    cells.groupBy(col("g"))
      .agg(first(col("ta")).as("n_rows"), sum(termU).as("psi_u"))
      .select(col("g").as("group"), col("n_rows"),
        round(col("psi_u").cast("double") / lit(1.0e12d), 6).as("psi"))
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) variance
    * reduction per group: θ = cov(X,Y)/var(X) from ONE moment aggregate
    * (n, Σx, Σy, Σxy, Σx², Σy²), and the adjusted metric's variance
    * var(Y − θ(X − x̄)) = var(Y)·(1 − ρ²) — the experimentation
    * pipeline's sensitivity win, reported without materializing any
    * per-row adjustment.
    *
    * X and Y must be integer units (scores, counts, integer-quantized
    * metrics): cnum = nΣxy − ΣxΣy and the two variance numerators are
    * then EXACT int64 (bounds: with units ≤ 10³ the products stay
    * int64-safe to n ≈ 3·10⁶ rows per group; re-quantize coarser units
    * beyond that — a runtime guard raises an error the moment any
    * moment product could exceed int64, so overflow fails loudly
    * instead of silently wrapping under non-ANSI arithmetic).
    * θ, ρ², means and variances are one IEEE division
    * each off the exact integers, so both engines agree bit for bit.
    * Degenerate groups (var X = 0 or var Y = 0) report null θ/ρ².
    */
  def cuped(df: DataFrame, groupCol: Column, xCol: Column,
      yCol: Column): DataFrame = {
    val agg = df.select(groupCol.as("g"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // Overflow guard: every product below is bounded by M·V with
      // M = max(n,|Σx|,|Σy|) and V = max(|Σxy|,|Σx²|,|Σy²|,|Σx|,|Σy|,n);
      // requiring M·V ≤ int64max/2 keeps each product AND the following
      // subtraction exact. Violation raises instead of wrapping.
      .withColumn("_momM",
        greatest(col("n"), abs(col("sx")), abs(col("sy"))))
      .withColumn("_momV",
        greatest(abs(col("sxy")), abs(col("sxx")), abs(col("syy")),
          abs(col("sx")), abs(col("sy")), col("n")))
      .withColumn("_momOk",
        col("_momM") <= lit(Long.MaxValue / 2L) / greatest(col("_momV"), lit(1L)))
      .withColumn("cnum",
        when(col("_momOk"), col("n") * col("sxy") - col("sx") * col("sy"))
          .otherwise(raise_error(concat(
            lit("cuped: int64 overflow in moment products for group "),
            col("g").cast("string"),
            lit(" (n="), col("n").cast("string"),
            lit(") — re-quantize x/y to coarser integer units")))))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
    val rho2 = col("cnum").cast("double") * col("cnum").cast("double") /
      (col("vx").cast("double") * col("vy").cast("double"))
    val varY = col("vy").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    agg.select(col("g").as("group"), col("n"),
      when(col("vx") > 0L,
        round(col("cnum").cast("double") / col("vx").cast("double"), 6))
        .as("theta"),
      when(col("vx") > 0L && col("vy") > 0L, round(rho2, 6)).as("rho2"),
      round(col("sy").cast("double") / col("n").cast("double"), 6)
        .as("mean_y"),
      round(varY, 6).as("var_y"),
      when(col("vx") > 0L && col("vy") > 0L,
        round(varY * (lit(1.0d) - rho2), 6)).as("var_y_adj"))
  }

  /** Split-conformal calibration threshold per group: the k-th smallest
    * nonconformity score with k = ⌈(n+1)·(1−α)⌉ — the
    * distribution-free "accept if score ≤ threshold ⇒ ≥ 1−α coverage"
    * guarantee (Vovk et al.; the modern selective-prediction gate).
    * α is given in integer percent so k is EXACT integer arithmetic:
    * k = ⌈(n+1)(100−αPct)/100⌉ via the div-ceil identity — no float
    * decides the order statistic.
    *
    * Runs on the score-unit contingency collapse (the q171 shape): the
    * ordered pass windows over ≤ resolution rows per group, and the
    * threshold is the smallest unit whose inclusive cumulative count
    * reaches k. Groups with k > n (too few calibration rows for the
    * requested coverage) report a null threshold rather than a fake
    * max. Empirical coverage = cum(threshold)/n is the one division.
    */
  def conformalThreshold(df: DataFrame, groupCol: Column,
      unitsCol: Column, alphaPct: Int = 10): DataFrame =
    conformalFromUnitCounts(
      df.select(groupCol.as("g"), unitsCol.cast("long").as("u"))
        .groupBy(col("g"), col("u")).agg(count(lit(1)).as("c")), alphaPct)

  /** Finalize a persisted/streamed [[scoreContingency]] table to the
    * per-group conformal threshold — the calibration gate answers from
    * the same state AUC/ECE/lift/PSI maintain.
    */
  def conformalThresholdFromContingency(contingency: DataFrame,
      alphaPct: Int = 10): DataFrame =
    conformalFromUnitCounts(
      contingency.select(col("g"), col("u"), col("n").as("c")), alphaPct)

  private def conformalFromUnitCounts(per: DataFrame,
      alphaPct: Int): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100, "alphaPct in (0, 100)")
    val cum = per.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("u"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val kNum = (col("n") + 1L) * lit(100L - alphaPct) + 99L
    val tot = per.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .withColumn("k",
        ((kNum - pmod(kNum, lit(100L))) / 100L).cast("long"))
    val hit = cum.join(tot, "g").where(col("cum") >= col("k"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("u"))))
      .where(col("rn") === 1)
      .select(col("g"), col("u").as("threshold_unit"),
        col("cum").as("n_covered"))
    tot.join(hit, Seq("g"), "left")
      .select(col("g").as("group"), col("n"), col("k"),
        when(col("k") <= col("n"), col("threshold_unit"))
          .as("threshold_unit"),
        when(col("k") <= col("n"), col("n_covered")).as("n_covered"),
        when(col("k") <= col("n"),
          round(col("n_covered").cast("double") / col("n").cast("double"),
            6)).as("coverage"))
  }

  /** Two-proportion A/B test per group: arm sizes/successes from ONE
    * combinable aggregate, then the pooled two-proportion z statistic
    * and the treatment arm's Wilson 95% interval — the experiment
    * readout (q191's CUPED reduces the variance; THIS decides
    * significance). All counts exact int64; every ratio is one IEEE
    * division replayed verbatim by the oracle (the canonical-
    * parenthesization discipline — sqrt is correctly rounded on both
    * engines, so the full expressions agree bit for bit).
    *
    * Degenerate guards: z needs both arms non-empty and a pooled rate
    * strictly inside (0, 1); the Wilson interval needs a non-empty
    * treatment arm — null otherwise.
    */
  def abTest(df: DataFrame, groupCol: Column, armCol: Column,
      labelCol: Column): DataFrame = {
    val agg = df.select(groupCol.as("g"), armCol.cast("long").as("t"),
        labelCol.cast("long").as("y"))
      .groupBy(col("g"))
      .agg(sum(col("t")).as("n1"), sum(col("t") * col("y")).as("x1"),
        sum(lit(1L) - col("t")).as("n0"),
        sum((lit(1L) - col("t")) * col("y")).as("x0"))
    val n1d = col("n1").cast("double")
    val n0d = col("n0").cast("double")
    val p1 = col("x1").cast("double") / n1d
    val p0 = col("x0").cast("double") / n0d
    val pp = (col("x1") + col("x0")).cast("double") /
      (col("n1") + col("n0")).cast("double")
    val z = (p1 - p0) / sqrt(pp * (lit(1.0d) - pp) *
      (lit(1.0d) / n1d + lit(1.0d) / n0d))
    val denom = lit(1.0d) + lit(3.8416d) / n1d
    val center = (p1 + lit(3.8416d) / (lit(2.0d) * n1d)) / denom
    val half = lit(1.96d) * sqrt(p1 * (lit(1.0d) - p1) / n1d +
      lit(3.8416d) / (lit(4.0d) * n1d * n1d)) / denom
    val zOk = col("n1") > 0L && col("n0") > 0L &&
      col("x1") + col("x0") > 0L &&
      col("x1") + col("x0") < col("n1") + col("n0")
    agg.select(col("g").as("group"), col("n1"), col("x1"), col("n0"),
      col("x0"),
      when(col("n1") > 0L, round(p1, 6)).as("p1"),
      when(col("n0") > 0L, round(p0, 6)).as("p0"),
      when(col("n1") > 0L && col("n0") > 0L, round(p1 - p0, 6))
        .as("lift"),
      when(zOk, round(z, 6)).as("z"),
      when(col("n1") > 0L, round(center - half, 6)).as("wilson_lo"),
      when(col("n1") > 0L, round(center + half, 6)).as("wilson_hi"))
  }

  /** Percentile-bootstrap confidence interval for each group's mean —
    * with DETERMINISTIC, engine-portable resampling, so the oracle
    * replays every draw: resample r's slot i picks the value at
    * in-group rank portableBucket(gid·1000003 + r·2654435761 + i) mod n
    * (rank→value is well-defined under ties because equal ranks carry
    * equal values), each resample's mean is the exact int64 sum of its
    * picks (same n ⇒ ordering sums IS ordering means — no float enters
    * the order statistics), and the CI bounds are the ⌈m·α/2⌉-th /
    * (m+1−⌈m·α/2⌉)-th smallest resample sums, divided once at the end.
    *
    * Scale: the slots frame is m·N rows — linear in the corpus times a
    * constant m; the rank join is one hash shuffle on (g, rank). At
    * 100 TB you bootstrap a SAMPLED stratum (the statistic needs
    * hundreds of rows per group, not billions) — this operator is the
    * per-stratum finisher, not a full-corpus pass. gid (a dense index
    * over ≤|groups| rows) and the per-group ranking window over group
    * rows are the only windows.
    */
  def bootstrapMeanCI(df: DataFrame, groupCol: Column, unitsCol: Column,
      m: Int = 200, alphaPct: Int = 5): DataFrame = {
    require(m > 1 && alphaPct > 0 && alphaPct < 100, "m > 1, α in (0,100)")
    val kLo = (m.toLong * alphaPct + 199L) / 200L // ceil(m·α/200)
    val kHi = m.toLong + 1L - kLo
    val base = df.select(groupCol.as("g"), unitsCol.cast("long").as("u"))
    val ranked = base.withColumn("pos",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("u")))
        .cast("long") - 1L)
    val sizes = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("su"))
      .withColumn("gid",
        row_number().over(Window.orderBy(col("g"))).cast("long"))
    // sizes sits on ONE partition (its gid comes from a global window),
    // so without the re-spread the m×n slot explode generates every
    // resample row in a single task; spreading the (g, r) rows first
    // puts each resample's draw generation on its own task. Row set is
    // identical — idx is a pure function of (gid, r, i).
    val slots = graft.core.Par.ensure(sizes
      .select(col("g"), col("gid"), col("n"),
        explode(sequence(lit(0L), lit(m.toLong - 1L))).as("r")))
      .select(col("g"), col("gid"), col("n"), col("r"),
        explode(sequence(lit(0L), col("n") - 1L)).as("i"))
      .withColumn("idx", pmod(Sampling.portableBucket(
        col("gid") * 1000003L + col("r") * 2654435761L + col("i")),
        col("n")))
    // shuffled-hash, not sort-merge: the slots side is m× the corpus and
    // the per-partition build side (ranked) is corpus/partitions — the
    // guide §3.1 case where avoiding the big side's sort pays.
    val picks = slots.join(ranked.hint("shuffle_hash"),
      slots("g") === ranked("g") && slots("idx") === ranked("pos"))
      .select(slots("g").as("g"), col("r"), col("u"))
    val sums = picks.groupBy(col("g"), col("r"))
      .agg(sum(col("u")).as("s"))
    val ordered = sums.withColumn("rk",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("s"), col("r"))).cast("long"))
    val lo = ordered.where(col("rk") === kLo)
      .select(col("g"), col("s").as("s_lo"))
    val hi = ordered.where(col("rk") === kHi)
      .select(col("g"), col("s").as("s_hi"))
    sizes.join(lo, "g").join(hi, "g")
      .select(col("g").as("group"), col("n"), lit(m.toLong).as("m"),
        round(col("su").cast("double") / col("n").cast("double"), 6)
          .as("mean"),
        round(col("s_lo").cast("double") / col("n").cast("double"), 6)
          .as("ci_lo"),
        round(col("s_hi").cast("double") / col("n").cast("double"), 6)
          .as("ci_hi"))
  }

  def fairnessAudit(df: DataFrame, groupCol: Column, labelCol: Column,
      predCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"),
      labelCol.cast("long").as("y"), predCol.cast("long").as("p"))
    val per = base.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      sum(col("p")).as("sel"),
      sum(col("y")).as("pos"),
      sum(col("p") * col("y")).as("tp"),
      sum(col("p") * (lit(1L) - col("y"))).as("fp"))
    val overall = per.agg(sum(col("n")).as("n_all"),
      sum(col("sel")).as("sel_all"))
    per.crossJoin(broadcast(overall))
      .select(col("g").as("group"), col("n"), col("sel"),
        round(col("sel").cast("double") / col("n").cast("double"), 6)
          .as("sel_rate"),
        when(col("pos") > 0L,
          round(col("tp").cast("double") / col("pos").cast("double"), 6))
          .as("tpr"),
        when(col("n") - col("pos") > 0L,
          round(col("fp").cast("double") /
            (col("n") - col("pos")).cast("double"), 6)).as("fpr"),
        when(col("sel_all") > 0L,
          round((col("sel") * col("n_all")).cast("double") /
            (col("n") * col("sel_all")).cast("double"), 6))
          .as("disparate_impact"))
  }
}
