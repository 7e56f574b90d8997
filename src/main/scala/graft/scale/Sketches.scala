package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the monitoring primitive a 100 TB
  * pipeline runs daily: per-group HyperLogLog registers persisted as a
  * tiny table (64 ints per group), folded batch-by-batch with an
  * element-wise max, and queried for distinct-count estimates without
  * ever rescanning the corpus. q126's exact distinct-n diversity is the
  * certification-grade form; this is its steady-state sibling — the
  * register table for a group is ~256 bytes no matter how many tokens
  * the group has seen, and merge is associative + commutative +
  * idempotent, so shard-level sketches union in any order (re-delivered
  * batches are absorbed, not double-counted).
  *
  * Determinism (oracle-replayable): values enter as the 62-bit
  * engine-portable hash ([[graft.functions.NativeExpressions.portableHash62]]
  * family, h = h1·2^31 + h2 with h1,h2 < 2^31). bucket = h mod 64 (the
  * low bits of h2, since 2^31 is divisible by 64); rank = 32 − bitlen(h1)
  * (leading zeros of the 31-bit h1 plus one; h1 = 0 → 32). The estimate
  * is the Flajolet HLL harmonic mean: α·m² / Σ 2^−reg with α = 0.709 for
  * m = 64, the Σ a PINNED left fold in register order over exact dyadic
  * 2^−r terms (driver lookup table / 1.0/(1<<r) — no libm pow), so the
  * double is bit-identical across engines. The small-range
  * linear-counting correction uses ln and is therefore exposed only on
  * the Scala API ([[hllCorrectedEstimate]]), not the cross-engine
  * surface — q144 certifies registers, zero counts, and the harmonic
  * estimate.
  *
  * Scale shape: one narrow hash projection, one (group, bucket) max
  * aggregate (map-side combinable — the 64-value bucket domain makes
  * partial states tiny), one 64-row-per-group collapse to the register
  * array. Nothing corpus-sized shuffles; nothing reaches the driver.
  */
object Sketches {

  /** Register count (2^6). */
  val HllM = 64
  /** Max rank: 31 hash bits above the bucket field, +1; h1 = 0 folds in. */
  val HllMaxRank = 32
  /** Flajolet's α for m = 64. */
  val HllAlpha = 0.709

  /** 2^−r for r ∈ [0, 32], computed exactly on the driver. */
  private val InvPow2: Seq[Double] = (0 to HllMaxRank).map(r => 1.0 / (1L << r))

  /** Build the per-group HLL register table from (group, 62-bit-hash)
    * rows: (groupCol, registers array<int>[64]). Hash rows with the same
    * value land in the same (bucket, rank) — duplicates are free, which
    * is the whole point.
    */
  def hllSketch(rows: DataFrame, groupCol: String, hashCol: String): DataFrame = {
    val h1 = shiftright(col(hashCol), 31)
    val bucket = (col(hashCol) % HllM).cast("int")
    val rank = when(h1 === 0L, HllMaxRank)
      .otherwise(lit(HllMaxRank) - length(conv(h1, 10, 2))).cast("int")
    rows.select(col(groupCol), bucket.as("__b"), rank.as("__r"))
      .groupBy(col(groupCol), col("__b")).agg(max(col("__r")).as("__reg"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__reg"))))
        .as("__m"))
      .select(col(groupCol),
        transform(sequence(lit(0), lit(HllM - 1)),
          b => coalesce(element_at(col("__m"), b), lit(0))).as("registers"))
  }

  /** Merge two sketch tables: full-outer on the group, element-wise max
    * of the register vectors (a group present on one side only keeps its
    * registers). merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B) bit for
    * bit — the max-aggregate is associative — which q144 certifies
    * against an oracle that builds from the union directly.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("registers").as("__ra"))
      .join(b.select(col(groupCol).as("__g"), col("registers").as("__rb")),
        col(groupCol) === col("__g"), "full_outer")
      .select(coalesce(col(groupCol), col("__g")).as(groupCol),
        when(col("__ra").isNull, col("__rb"))
          .when(col("__rb").isNull, col("__ra"))
          .otherwise(zip_with(col("__ra"), col("__rb"),
            (x, y) => greatest(x, y))).as("registers"))

  /** The harmonic-mean estimate column over a `registers` array: a
    * pinned left fold of exact 2^−reg terms, then α·m²/Σ rounded to 6dp.
    */
  def hllEstimateCol(registers: Column): Column = {
    val hsum = aggregate(registers, lit(0.0),
      (acc, r) => acc + element_at(typedLit(InvPow2), r + 1))
    round(lit(HllAlpha * HllM * HllM) / hsum, 6)
  }

  /** Estimates per group: (groupCol, registers, n_zero, hll_estimate).
    * `n_zero` (untouched registers) is the linear-counting input and a
    * saturation signal.
    */
  def hllEstimate(sk: DataFrame, groupCol: String): DataFrame =
    sk.select(col(groupCol), col("registers"),
      size(filter(col("registers"), r => r === 0)).cast("long").as("n_zero"),
      hllEstimateCol(col("registers")).as("hll_estimate"))

  /** The full HLL estimator with the small-range correction: linear
    * counting m·ln(m/V) when the harmonic estimate ≤ 2.5m and V > 0
    * empty registers remain. ln is transcendental — libm results may
    * differ in the last ulp across engines — so this variant is the
    * Scala-API surface (spec-tested for accuracy), while the
    * cross-engine certified q144 output carries the harmonic estimate
    * and the correction's exact integer input V.
    */
  def hllCorrectedEstimate(sk: DataFrame, groupCol: String): DataFrame = {
    val est = hllEstimate(sk, groupCol)
    val corrected = when(
      col("hll_estimate") <= lit(2.5 * HllM) && col("n_zero") > 0,
      round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("n_zero")), 6))
      .otherwise(col("hll_estimate"))
    est.withColumn("estimate", corrected)
  }

  /** Exact register fingerprint Σ (bucket+1)·reg — the integer checksum
    * the q144 oracle compares, sensitive to any single register drift.
    */
  def registerFingerprint(registers: Column): Column =
    aggregate(
      zip_with(registers, sequence(lit(1), lit(HllM)),
        (r, i) => r.cast("long") * i),
      lit(0L), (acc, x) => acc + x)

  // --------------------------------------------------------------------
  // Count-min sketch — the mergeable FREQUENCY companion of the HLL
  // cardinality sketch: per-group depth×width counter tables whose
  // point-query estimate is an upper bound on the true count
  // (never under; over by at most ε·N with prob 1−δ for width e/ε,
  // depth ln 1/δ — Cormode & Muthukrishnan 2005). merge = element-wise
  // SUM, which is associative/commutative but — unlike HLL's max — NOT
  // idempotent: a re-delivered batch double-counts, so streaming folds
  // must sit behind exactly-once batch boundaries (foreachBatch
  // checkpointing, as Streaming.maintainCmsSketches does).
  //
  // Determinism: values enter as the 62-bit portable hash; the per-row
  // slot is ((a_r·(h mod P) + b_r) mod P) mod width with P = 2^31−1 and
  // row-specific small (a, b) — every intermediate < 2^48, so the whole
  // sketch replays exactly in integer SQL (q155's oracle).
  // --------------------------------------------------------------------

  /** CMS depth (independent hash rows). */
  val CmsDepth = 4
  /** CMS width (counters per row). */
  val CmsWidth = 64
  /** Per-row affine salts (a, b) — small, so a·(h mod P) stays < 2^48. */
  val CmsSalts: Seq[(Long, Long)] =
    Seq((131L, 7L), (1571L, 101L), (8191L, 313L), (65599L, 911L))

  private val P31 = 2147483647L

  /** Flattened slot index (row·width + column) of hash column `h` in
    * row `r` — the single place the slot arithmetic lives, shared by
    * build and estimate so they can never drift apart.
    */
  def cmsSlot(h: Column, r: Int): Column = {
    val (a, b) = CmsSalts(r)
    ((h % P31) * a + b) % P31 % CmsWidth + (r * CmsWidth)
  }

  /** Build the per-group CMS from (group, 62-bit-hash) rows:
    * (groupCol, counters array<long>[depth·width]). One narrow ×depth
    * fan-out, one (group, slot) count — map-side combined into ≤ 256
    * partial cells per group per task — one 256-row collapse.
    */
  def cmsSketch(rows: DataFrame, groupCol: String, hashCol: String): DataFrame = {
    val slots = array((0 until CmsDepth).map(r => cmsSlot(col(hashCol), r)): _*)
    rows.select(col(groupCol), explode(slots).as("__slot"))
      .groupBy(col(groupCol), col("__slot"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("__slot"), col("__c"))))
        .as("__m"))
      .select(col(groupCol),
        transform(sequence(lit(0L), lit((CmsDepth * CmsWidth - 1).toLong)),
          s => coalesce(element_at(col("__m"), s), lit(0L))).as("counters"))
  }

  /** Merge two CMS tables: full-outer on the group, element-wise SUM.
    * merge(cms(A), cms(B)) ≡ cms(A ⊎ B) exactly — counts are additive —
    * which is why q155 can certify the parity-batch merge against an
    * oracle built from the whole corpus in one pass.
    */
  def cmsMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("counters").as("__ca"))
      .join(b.select(col(groupCol).as("__g"), col("counters").as("__cb")),
        col(groupCol) === col("__g"), "full_outer")
      .select(coalesce(col(groupCol), col("__g")).as(groupCol),
        when(col("__ca").isNull, col("__cb"))
          .when(col("__cb").isNull, col("__ca"))
          .otherwise(zip_with(col("__ca"), col("__cb"),
            (x, y) => x + y)).as("counters"))

  /** Point-query estimate of hash column `h` against a `counters`
    * array: min over the depth rows — the classic CMS upper bound.
    */
  def cmsEstimateCol(counters: Column, h: Column): Column =
    least((0 until CmsDepth).map(r =>
      element_at(counters, (cmsSlot(h, r) + 1).cast("int"))): _*)

  /** Counter-table fingerprint Σ (slot+1)·count — same checksum shape
    * as [[registerFingerprint]]; bounded by (depth·width)·N so it stays
    * far inside int64 for any realistic corpus.
    */
  def cmsFingerprint(counters: Column): Column =
    aggregate(
      zip_with(counters, sequence(lit(1L), lit((CmsDepth * CmsWidth).toLong)),
        (c, i) => c * i),
      lit(0L), (acc, x) => acc + x)

  // --------------------------------------------------------------------
  // Mergeable fixed-bin histogram — the QUANTILE member of the sketch
  // family (HLL = cardinality, CMS = frequency, this = distribution).
  // The exact-quantile operator (q102) re-scans to refine; this is its
  // steady-state sibling: one pass per batch, counters merge by
  // element-wise SUM, and any quantile answers from the persisted table
  // with error ≤ one bin width — the right trade for drift dashboards
  // over 100 TB. All arithmetic is int64 on pre-quantized units (the
  // q153 convention), so build, merge, rank walk, and the estimate all
  // replay exactly in integer SQL.
  //
  // Layout: counters[0] = underflow (u < lo), counters[1..bins] =
  // equal-width interior cells over [lo, hi), counters[bins+1] =
  // overflow (u ≥ hi). Estimate for rank r = the LOWER BOUND in units
  // of the first cell whose cumulative count reaches r (lo/hi for the
  // outer cells) — a total, engine-portable rule with no interpolation
  // float.
  // --------------------------------------------------------------------

  /** Length-agnostic counter fingerprint Σ (slot+1)·count — the
    * [[cmsFingerprint]] checksum for any counter-array sketch.
    */
  def counterFingerprint(counters: Column): Column =
    aggregate(
      zip_with(counters, sequence(lit(1L), size(counters).cast("long")),
        (c, i) => c * i),
      lit(0L), (acc, x) => acc + x)

  /** Exact long division of a NON-NEGATIVE long column by a positive
    * constant: Column./ is ALWAYS double division in Spark, which would
    * leak fractional slot keys into the sketch maps — subtract the
    * remainder first so the double divide is of an exact multiple
    * (exact for a < 2^53, far past any quantized-unit domain).
    */
  private def ldiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / b).cast("long")

  /** Slot index of unit-value column `u` for a [lo, hi) × bins layout.
    * Shared by build and oracle generation (the cmsSlot pattern): slot 0
    * underflow, 1..bins interior by integer division, bins+1 overflow.
    */
  def histSlot(u: Column, loUnits: Long, hiUnits: Long, bins: Int): Column = {
    require(bins >= 1 && hiUnits > loUnits, "need hi > lo and bins >= 1")
    require((hiUnits - loUnits) % bins == 0,
      s"bin width must be integral: ($hiUnits - $loUnits) % $bins != 0")
    val w = (hiUnits - loUnits) / bins
    when(u < loUnits, lit(0L))
      .when(u >= hiUnits, lit((bins + 1).toLong))
      .otherwise(ldiv(u - loUnits, w) + 1L)
  }

  /** Build the per-group histogram from (group, unitValue) rows:
    * (groupCol, counters array<long>[bins+2]). One narrow slot
    * projection + one map-side-combined (group, slot) count + one
    * ≤ bins+2-row collapse per group — the CMS build shape.
    */
  def histSketch(rows: DataFrame, groupCol: String, unitCol: String,
      loUnits: Long, hiUnits: Long, bins: Int): DataFrame =
    rows.select(col(groupCol),
        histSlot(col(unitCol), loUnits, hiUnits, bins).as("__slot"))
      .groupBy(col(groupCol), col("__slot"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("__slot"), col("__c"))))
        .as("__m"))
      .select(col(groupCol),
        transform(sequence(lit(0L), lit((bins + 1).toLong)),
          s => coalesce(element_at(col("__m"), s), lit(0L))).as("counters"))

  /** Merge two histogram tables: full-outer on the group, element-wise
    * SUM — exactly additive, so merge(hist(A), hist(B)) ≡ hist(A ⊎ B)
    * bit for bit (same contract and caveat as [[cmsMerge]]: additive
    * sketches need exactly-once transport; idempotent ones don't).
    */
  def histMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    cmsMerge(a, b, groupCol)

  /** Quantile estimate at exact rational q = num/den over a `counters`
    * array: the unit-value lower bound of the cell where the cumulative
    * count first reaches ceil(q·N) (lo for underflow, hi for overflow —
    * the sketch cannot resolve inside the outer cells). Pure int64: the
    * rank is (N·num + den − 1) div den; the walk is a pinned fold over
    * the ≤ bins+2 cells. Error vs the exact quantile is ≤ one bin width
    * for in-range data (spec-asserted), 0 extra cost per query — the
    * counters are already in memory.
    */
  def histQuantileCol(counters: Column, num: Int, den: Int,
      loUnits: Long, hiUnits: Long, bins: Int): Column = {
    require(num >= 1 && num <= den, s"quantile $num/$den outside (0, 1]")
    val w = (hiUnits - loUnits) / bins
    val n = aggregate(counters, lit(0L), (acc, x) => acc + x)
    val rank = ldiv(n * num + (den - 1), den)
    // fold state: struct(cum, ans) — ans latches the first reaching cell
    val walked = aggregate(
      zip_with(counters, sequence(lit(0L), lit((bins + 1).toLong)),
        (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (st, cell) => {
        val cum = st.getField("cum") + cell.getField("c")
        val bound = when(cell.getField("i") === 0L, lit(loUnits))
          .when(cell.getField("i") === (bins + 1).toLong, lit(hiUnits))
          .otherwise(lit(loUnits) + (cell.getField("i") - 1L) * w)
        struct(cum.as("cum"),
          when(st.getField("ans").isNotNull, st.getField("ans"))
            .when(cum >= rank, bound).otherwise(lit(null).cast("long"))
            .as("ans"))
      })
    walked.getField("ans")
  }
}
