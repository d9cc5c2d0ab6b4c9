package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity against an in-domain LM" quality filter, with the LM and the
  * scoring pass both expressed relationally over the same corpus. Per
  * document: the mean negative log-likelihood (nats/bigram) of its word
  * bigrams under an add-α smoothed conditional
  * `P(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α·V)`, where `c` are corpus
  * counts, `c(w1,·)` the bigram-context count, and `V` the corpus vocabulary
  * size. Lower score = more typical text; a threshold on it is the fluency
  * filter.
  *
  * Scale shape: the exploded bigram stream is collapsed ONCE to per-doc
  * (w1, w2, multiplicity) — after that every relation is distinct bigrams,
  * not occurrences, so a common bigram repeated across a shard costs one
  * row, not millions. The LM is two partial-aggregatable groupBys over that
  * collapsed table ((w1,w2), then w1 derived from it — the context pass
  * never re-reads the occurrence stream); V is a 1-row aggregate broadcast
  * into the scoring join. Scoring joins distinct doc-bigrams against the
  * count tables keyed by (w1,w2) / w1 — natural-language token counts are
  * Zipfian, exactly the skew AQE's skew-join split handles — then one
  * doc-keyed multiplicity-weighted average. No windows, no driver state.
  *
  * Exactness contract: `ln` is NOT bit-identical across engines, so
  * cross-engine oracles must compare the score at fixed precision
  * (`round(score, 6)` on both sides); everything before the log is integer
  * counts cast to double, which IS exact.
  */
object NgramLM {

  /** Per-document `n_bigrams` and `score` (mean NLL, nats/bigram; 0.0 for
    * docs with fewer than two words). */
  def bigramScore(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.words(TextOps.normalized(col(textCol))).as("ws"))
    val pairs = base
      .select(id,
        explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("p"))
      .select(id, col("p.w1").as("w1"), col("p.w2").as("w2"))
    val docBi = pairs.groupBy(id, col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val bigramC = docBi.groupBy("w1", "w2")
      .agg(sum(col("m")).cast("double").as("cb"))
    val contextC = bigramC.groupBy("w1")
      .agg(sum(col("cb")).as("cw"))
    val vocab = base.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    val scored = docBi
      .join(bigramC, Seq("w1", "w2"))
      .join(contextC, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(id, col("m"),
        (-log((col("cb") + alpha) / (col("cw") + col("v") * alpha)))
          .as("nll"))
      .groupBy(id)
      .agg(sum(col("m")).as("n_bigrams"),
        (sum(col("m") * col("nll")) / sum(col("m"))).as("score"))
    base.select(id)
      .join(scored, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }
}
