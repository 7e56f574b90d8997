package graft.ml

/** Compiles an [[XgbModel]] tree ensemble into DuckDB SQL that reproduces
  * [[XgbModel.margin]] BIT-EXACTLY, giving the M6 scorer a full hash-match
  * oracle (reference models: xgb_{cvd,ckd,anemia}_model.json; scoring
  * semantics test.py:324-343).
  *
  * Exactness argument, term by term:
  *  - features are narrowed to float32 on both engines before comparing
  *    (`CAST(expr AS REAL)` here; `v.toFloat` in [[XgbModel.treeScore]]),
  *    and every threshold/leaf renders via `Float.toString` — a
  *    round-trippable decimal that `CAST('…' AS REAL)` parses back to the
  *    identical float32;
  *  - each tree is a nested CASE WHEN mirroring the walk (feature <
  *    threshold → left); leaves widen float32 → double exactly on both
  *    engines;
  *  - the margin is a LEFT-ASSOCIATIVE double sum (base + t0) + t1 + …,
  *    the same order as the Scala accumulator loop, so no reassociation;
  *  - `baseMargin` (the one transcendental) is computed ONCE in Scala and
  *    embedded as its shortest-round-trip repr — the SQL never calls log;
  *  - the sigmoid is deliberately NOT compiled: callers compare margins
  *    (and thresholds mapped into margin space), keeping libm `exp` out.
  *
  * Plumbing: DuckDB's binder recurses per expression-tree level and caps
  * at depth 128, so the 400-term sum is staged into chunked CTEs; the
  * stages are `MATERIALIZED` because default CTE inlining re-expands the
  * ~400 KB tree stage into every downstream stage (measured 76 s binding
  * → 4.7 s materialized at sf0.01).
  */
object XgbSql {

  private def d(x: Double): String = s"CAST('$x' AS DOUBLE)"
  private def r(x: Float): String = s"CAST('$x' AS REAL)"

  /** Nested CASE for one tree over REAL columns f0..f{n-1}. Missing-value
    * (default_left) routing is NOT compiled — callers must feed non-NULL
    * features; [[marginCtes]] documents the contract.
    */
  private def treeCase(t: XgbTree, i: Int): String =
    if (t.leftChildren(i) == -1) r(t.splitConditions(i))
    else s"CASE WHEN f${t.splitIndices(i)} < ${r(t.splitConditions(i))} " +
      s"THEN ${treeCase(t, t.leftChildren(i))} ELSE ${treeCase(t, t.rightChildren(i))} END"

  /** CTE chain computing the ensemble margin for every row of `from`.
    *
    * @param idExpr       unique-id SQL expression (exposed as `id`)
    * @param featureExprs DOUBLE-typed SQL expressions in model feature
    *                     order; must never evaluate to NULL (the compiled
    *                     trees have no missing-value branch)
    * @param chunk        trees summed per stage (binder depth ≤ ~2·chunk)
    * @return (cteBody, finalRelation, marginColumn) — embed as
    *         `WITH <cteBody> SELECT id, <marginColumn> … FROM <finalRelation>`
    */
  def marginCtes(model: XgbModel, idExpr: String, featureExprs: Seq[String],
      from: String, chunk: Int = 48): (String, String, String) = {
    require(featureExprs.length == model.numFeature,
      s"model expects ${model.numFeature} features, got ${featureExprs.length}")
    val featCols = featureExprs.zipWithIndex
      .map { case (e, j) => s"CAST($e AS REAL) AS f$j" }.mkString(", ")
    val treeCols = model.trees.zipWithIndex
      .map { case (t, k) => s"CAST(${treeCase(t, 0)} AS DOUBLE) AS t$k" }.mkString(", ")
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"feat AS (SELECT $idExpr AS id, $featCols FROM $from)",
      s"tr AS MATERIALIZED (SELECT id, $treeCols FROM feat)")
    var prev = "tr"
    var k = 0
    var stage = 0
    while (k < model.trees.length) {
      val hi = math.min(k + chunk, model.trees.length)
      var e = if (stage == 0) d(model.baseMargin) else s"p${stage - 1}"
      var j = k
      while (j < hi) { e = s"($e + t$j)"; j += 1 }
      ctes += s"c$stage AS MATERIALIZED (SELECT $prev.*, $e AS p$stage FROM $prev)"
      prev = s"c$stage"
      k = hi
      stage += 1
    }
    (ctes.mkString(",\n"), prev, s"p${stage - 1}")
  }
}
