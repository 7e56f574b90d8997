package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model training/evaluation — the "how predictable
  * is this corpus under a model of that corpus" leg: interpolated
  * Kneser–Ney, the strongest classical n-gram smoother, trained on one
  * frame and scored on another (q89's Laplace NLL is the in-corpus
  * probe; this is the held-out instrument that actually detects
  * distribution shift, contamination, and template inflation).
  *
  * Engine-portability discipline (the q177 pattern): every probability
  * is computed from INTEGER counts through ONE canonical IEEE expression
  * shape, quantized once to micro-log-units, and all aggregation past
  * that point is int64 — the per-source cross-entropy is an exact
  * integer ratio both engines round identically.
  */
object Lm {

  /** Interpolated KN bigram cross-entropy of `evalDocs` under a model
    * of `trainDocs`, reported per `srcCol` group of the eval side.
    *
    * Model (discount D = 0.75, exactly representable):
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *              + (D·N1+(w1·)/c(w1·)) · Pcont(w2)         [c(w1·) > 0]
    *            = Pcont(w2)                                 [w1 unseen]
    *   Pcont(w2) = (N1+(·w2) + 1) / (T + V + 1)
    * where N1+ are distinct-continuation counts, T = distinct bigram
    * types, V = train vocabulary — the +1 continuation floor keeps OOV
    * probabilities finite and deterministic (no tuned UNK mass).
    *
    * Scale shape: the model is three count frames derived from ONE
    * bigram-collapse of the train corpus (c(w1w2); per-w1 totals and
    * fan-outs re-aggregated from the TYPE table, never a second corpus
    * pass; per-w2 fan-ins likewise); eval bigrams collapse to
    * (src, w1, w2, m) multiplicities before any model join, so a
    * template repeated a million times scores once and weights m. The
    * (T, V) frame is a broadcast single row. Output: |sources| rows —
    * n_bigrams, n_oov (w2 with no training continuation), exact
    * nll_units, ce (nats), ppl.
    */
  def knBigramCrossEntropy(trainDocs: DataFrame, evalDocs: DataFrame,
      srcCol: Column, textCol: Column): DataFrame = {
    val d = 0.75d
    val trainPar = graft.core.Par.ensure(trainDocs)
    // biT feeds FOUR consumers (heads, tails, types, the eval join) —
    // without a freeze each branch re-runs the tokenize+bigram explode
    // over the training corpus; one shared w1 exchange runs it once per
    // action (the Dedup.sharedShuffle lifecycle).
    val biT = Dedup.sharedShuffle(trainPar
      .select(explode(TextOps.bigrams(TextOps.tokens(textCol)))
        .as("bigram"))
      .select(split(col("bigram"), " ", 2).getItem(0).as("w1"),
        split(col("bigram"), " ", 2).getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb")),
      col("w1"))
    val heads = biT.groupBy(col("w1"))
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1f"))
    val tails = biT.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = biT.agg(count(lit(1)).as("tt"))
    val vocab = trainPar
      .select(explode(TextOps.tokens(textCol)).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    val consts = types.crossJoin(vocab)
    val biE = graft.core.Par.ensure(evalDocs)
      .select(srcCol.as("src"),
        explode(TextOps.bigrams(TextOps.tokens(textCol))).as("bigram"))
      .select(col("src"),
        split(col("bigram"), " ", 2).getItem(0).as("w1"),
        split(col("bigram"), " ", 2).getItem(1).as("w2"))
      .groupBy(col("src"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1L)).cast("double") /
      (col("tt") + col("v") + lit(1L)).cast("double")
    val prob = when(col("c1").isNotNull,
      greatest(coalesce(col("cb"), lit(0L)).cast("double") - lit(d),
        lit(0.0d)) / col("c1").cast("double") +
        (lit(d) * col("n1f").cast("double") / col("c1").cast("double")) *
          pcont)
      .otherwise(pcont)
    val scoredRows = biE
      .join(biT, Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .join(tails, Seq("w2"), "left")
      .crossJoin(broadcast(consts))
      .select(col("src"), col("m"),
        col("n1b").isNull.cast("long").as("oov"),
        (-round(lit(1000000.0d) * log(prob)).cast("long")).as("lpu"))
    scoredRows.groupBy(col("src"))
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("oov")).as("n_oov"),
        sum(col("m") * col("lpu")).as("nll_units"))
      .select(col("src").as("source"), col("n_bigrams"), col("n_oov"),
        col("nll_units"),
        round(col("nll_units").cast("double") /
          (lit(1000000.0d) * col("n_bigrams").cast("double")), 6)
          .as("ce_nats"),
        round(exp(col("nll_units").cast("double") /
          (lit(1000000.0d) * col("n_bigrams").cast("double"))), 6)
          .as("ppl"))
  }
}
