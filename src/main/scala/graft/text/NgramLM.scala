package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A trained bigram LM: `bigrams` (w1, w2, cb), `contexts` (w1, cw), and
  * the 1-row `vocab` (v) — plain DataFrames, so a model persists as three
  * parquet tables and scoring composes with any source, including a
  * micro-batched stream (stream-static joins / foreachBatch). */
case class BigramModel(bigrams: DataFrame, contexts: DataFrame,
    vocab: DataFrame, alpha: Double)

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity against an in-domain LM" quality filter, with the LM and the
  * scoring pass both expressed relationally. Per document: the mean
  * negative log-likelihood (nats/bigram) of its word bigrams under an
  * add-α smoothed conditional
  * `P(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α·V)`, where `c` are corpus
  * counts, `c(w1,·)` the bigram-context count, and `V` the training
  * vocabulary size. Lower score = more typical text; a threshold on it is
  * the fluency filter. [[NgramLM.train]] builds the model;
  * [[NgramLM.score]] applies it to ANY document set (unseen bigrams and
  * contexts smooth to α/(c+αV) and 1/V); [[NgramLM.bigramScore]] is the
  * self-scoring composition the q99 oracle pins.
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

  private def normWords(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol),
      TextOps.tokens(col(textCol)).as("ws"))

  /** Per-doc distinct bigrams with multiplicity: (id, w1, w2, m). */
  private def docBigrams(base: DataFrame, idCol: String): DataFrame =
    base
      .select(col(idCol),
        explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))

  private def trainFrom(base: DataFrame, docBi: DataFrame,
      alpha: Double): BigramModel = {
    val bigramC = docBi.groupBy("w1", "w2")
      .agg(sum(col("m")).cast("double").as("cb"))
    val contextC = bigramC.groupBy("w1")
      .agg(sum(col("cb")).as("cw"))
    val vocab = base.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    BigramModel(bigramC, contextC, vocab, alpha)
  }

  /** Train the LM on a corpus. */
  def train(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): BigramModel = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val base = normWords(df, idCol, textCol)
    trainFrom(base, docBigrams(base, idCol), alpha)
  }

  /** Score any document set against a trained model. Bigrams absent from
    * the model back off to the smoothing mass (`cb = 0`); unseen contexts
    * to the uniform `1/V`. Output: id, `n_bigrams`, `score` (0.0 for docs
    * with fewer than two words). */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: BigramModel): DataFrame = {
    val base = normWords(df, idCol, textCol)
    scoreFrom(base, docBigrams(base, idCol), idCol, model)
  }

  private def scoreFrom(base: DataFrame, docBi: DataFrame, idCol: String,
      model: BigramModel): DataFrame = {
    val id = col(idCol)
    val a = model.alpha
    val scored = docBi
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(id, col("m"),
        (-log((coalesce(col("cb"), lit(0.0)) + a)
          / (coalesce(col("cw"), lit(0.0)) + col("v") * a))).as("nll"))
      .groupBy(id)
      .agg(sum(col("m")).as("n_bigrams"),
        (sum(col("m") * col("nll")) / sum(col("m"))).as("score"))
    base.select(id)
      .join(scored, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** CCNet-style corpus partition by LM score: self-score every document
    * ([[bigramScore]]), then split the corpus into `head` / `middle` /
    * `tail` at the `loFrac`/`hiFrac` exact interpolated percentiles of the
    * per-doc score (lower score = more fluent = head — the bucket CCNet
    * trains on first). Wenzek et al., *CCNet* (LREC 2020) partition by
    * thirds of LM perplexity; this is that operator with the LM itself
    * relational.
    *
    * Scale shape: the two cutoffs are ONE bounded aggregate over the
    * scored frame, broadcast back as a 1-row frame — no global sort, no
    * window, no ntile. The scored subtree feeds both the cutoff aggregate
    * and the labeling projection; its exchanges canonicalize identically
    * on both paths, so ReuseExchange evaluates the scoring pipeline once.
    *
    * Cross-engine contract: scores are rounded to 6 decimals BEFORE the
    * percentile/compare (the `ln` ulp rule above), so the cutoffs and the
    * `<=` bucket tests run on bit-identical doubles in any engine. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      loFrac: Double = 0.33, hiFrac: Double = 0.67): DataFrame = {
    require(0 < loFrac && loFrac < hiFrac && hiFrac < 1,
      s"perplexityBuckets: need 0 < loFrac < hiFrac < 1, got $loFrac/$hiFrac")
    val scored = bigramScore(df, idCol, textCol)
      .withColumn("score", round(col("score"), 6))
    val cuts = scored.agg(
      expr(s"percentile(score, $loFrac)").as("__lo"),
      expr(s"percentile(score, $hiFrac)").as("__hi"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_bigrams"), col("score"),
        when(col("score") <= col("__lo"), lit("head"))
          .when(col("score") <= col("__hi"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Self-scoring: train on `df` and score `df` (the q99 oracle form —
    * every bigram/context is in-model, so the left-join backoff never
    * fires and the result equals the original inner-join spelling). The
    * doc-bigram subtree is built ONCE and shared between the train and
    * score sides, so its exchange canonicalizes identically on both paths
    * and ReuseExchange runs the corpus explode+collapse a single time
    * instead of twice. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val base = normWords(df, idCol, textCol)
    val docBi = docBigrams(base, idCol)
    scoreFrom(base, docBi, idCol, trainFrom(base, docBi, alpha))
  }
}
