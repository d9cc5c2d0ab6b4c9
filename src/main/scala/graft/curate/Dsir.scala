package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** DSIR-style importance weighting (Xie et al., NeurIPS'23 — "Data
  * Selection for Language Models via Importance Resampling"): score every
  * document by how much more likely its hashed-token features are under a
  * TARGET distribution (e.g. an in-domain slice) than under the RAW corpus
  * distribution. The per-doc log importance weight
  * `Σ_tokens ln(p̂_tgt(b)/p̂_raw(b))` over hashed feature buckets (add-α
  * smoothed) is the resampling key: sample raw docs ∝ exp(weight) to shift
  * the corpus toward the target domain without a trained classifier.
  *
  * Scale shape: one corpus pass explodes tokens and collapses them
  * immediately to per-(doc, bucket) multiplicities (partial-agg friendly,
  * bounded by `buckets` rows per doc); both distributions are ≤`buckets`-row
  * aggregates OF that collapsed table (the target side never re-reads the
  * corpus), broadcast back into the scoring join; one doc-keyed sum
  * finishes. No windows, no driver state, nothing all-pairs.
  *
  * Exactness contract: feature hashing reuses [[Sampling.bucket32]]'s
  * md5-prefix bucketing (identical in any engine with md5); the counts are
  * exact integers; `ln` is the one transcendental, so cross-engine oracles
  * compare the final weight at fixed precision (`round(score, 6)` both
  * sides — the q99 contract).
  */
object Dsir {

  /** Per-document importance weights against the rows where `isTarget` is
    * true. Output: (idCol, is_target, n_tokens, logw) with `logw` the SUM
    * of per-token log probability ratios (0.0 for token-less docs; target
    * docs score themselves like any raw doc — DSIR resamples from the raw
    * pool, the flag is provenance). */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, alpha: Double = 1.0)
      : DataFrame = {
    require(buckets >= 2, s"need >= 2 feature buckets, got $buckets")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val id = col(idCol)
    val base = df.select(id, isTarget.cast("boolean").as("is_target"),
      TextOps.words(TextOps.normalized(col(textCol))).as("ws"))
    val tok = base
      .select(id, col("is_target"), explode(col("ws")).as("w"))
      // split("", " ") yields [""] — the empty string is not a token
      .filter(col("w") =!= "")
      .withColumn("b", Sampling.bucket32(col("w")) % buckets)
      .groupBy(id, col("is_target"), col("b"))
      .agg(count(lit(1)).as("m"))
    val rawC = tok.groupBy(col("b")).agg(sum(col("m")).as("c_raw"))
    val tgtC = tok.filter(col("is_target"))
      .groupBy(col("b")).agg(sum(col("m")).as("c_tgt"))
    val dist = rawC.join(tgtC, Seq("b"), "left")
      .select(col("b"), col("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val totals = dist.agg(sum(col("c_raw")).as("t_raw"),
      sum(col("c_tgt")).as("t_tgt"))
    val aB = alpha * buckets
    val ratio =
      log((col("c_tgt").cast("double") + alpha)
          / (col("t_tgt").cast("double") + aB)) -
      log((col("c_raw").cast("double") + alpha)
          / (col("t_raw").cast("double") + aB))
    val scored = tok
      .join(broadcast(dist.crossJoin(totals)), Seq("b"))
      .select(id, col("m"), ratio.as("r"))
      .groupBy(id)
      .agg(sum(col("m")).as("n_tokens"),
        sum(col("m").cast("double") * col("r")).as("logw"))
    base.select(id, col("is_target"))
      .join(scored, Seq(idCol), "left")
      .select(id, col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logw"), lit(0.0)).as("logw"))
  }
}
