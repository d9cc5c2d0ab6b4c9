package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** DSIR-style importance weighting (Xie et al., NeurIPS'23 — "Data
  * Selection for Language Models via Importance Resampling"): score every
  * document by how much more likely its hashed-token features are under a
  * TARGET distribution (e.g. an in-domain slice) than under the RAW corpus
  * distribution. The per-doc log importance weight
  * `Σ_tokens ln(p̂_tgt(b)/p̂_raw(b))` over hashed feature buckets (add-α
  * smoothed) is the resampling key: sample raw docs ∝ exp(weight) to shift
  * the corpus toward the target domain without a trained classifier.
  *
  * Scale shape: the computation is inherently TWO reads of the tokenized
  * corpus — once to build the bucket distributions, once to score against
  * them — so the collapsed per-(doc, bucket) table (`buckets`-bounded per
  * doc, far smaller than the text) is MATERIALIZED once and both reads
  * hit the materialization; the corpus text itself is scanned and
  * tokenized exactly once. That is the same move a columnar engine makes
  * when it materializes the shared CTE, and measurement says it is the
  * whole game (see the perf-anatomy note in the code): without it, Spark
  * re-tokenizes the corpus once per consumer of the shared subplan
  * (adaptive exchange reuse does not bridge the broadcast boundary —
  * observed 3 tokenize passes, 70 s where the materialized form costs
  * ~1.2 passes). Both distributions come from ONE conditional aggregate;
  * the ≤`buckets`-row distribution table is broadcast back into the
  * scoring join; one doc-keyed sum finishes. No windows, no driver state,
  * nothing all-pairs.
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
    * pool, the flag is provenance).
    *
    * `scratchDir`: when set, the collapsed (doc, bucket, multiplicity)
    * table is eagerly written under it as parquet and every downstream
    * consumer reads the materialization — the corpus is tokenized ONCE
    * (the CTE-materialization analog). The fused token_buckets kernel
    * has since closed the bench-scale gap between the strategies: a
    * three-way re-measurement (2026-08-14, min-of-3, ×10 and ×100
    * corpus) put lazy / localCheckpoint / parquet-scratch at
    * 1.37 / 1.11 / 1.36 s (×10) and 2.90 / 3.10 / 2.98 s (×100) —
    * within this host's run-to-run variance of each other, so the
    * choice no longer matters at bench scale. The at-scale guidance is
    * unchanged — at 100 TB the collapsed table is orders of magnitude
    * smaller than the text, so materializing it beats even one extra
    * kernel pass — pass a scratch dir for anything big; None is
    * correct (and fine) for small one-shots. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, alpha: Double = 1.0,
      scratchDir: Option[String] = None): DataFrame = {
    require(buckets >= 2, s"need >= 2 feature buckets, got $buckets")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val id = col(idCol)
    // PERF anatomy (measured at ×100 corpus scale, 32 cores): the cost of
    // this stage was ENTIRELY the two regexp_replace passes of the
    // composed tokenizer (~25 s/corpus pass; the per-occurrence md5
    // pipelined behind them for ~nothing). The fused token_buckets
    // kernel (graft.functions.TokenBuckets — Spark's own lower(), then
    // one byte pass + md5 bucket, spec-pinned byte-equal to the composed
    // form) removes the regex entirely, and exploding int buckets beats
    // exploding token strings. Tokenizing the corpus ONCE still matters:
    // hashing a distinct-word vocabulary instead was tried and is a net
    // LOSS (it needs its own corpus-tokenizing pass or a per-(doc, word)
    // string shuffle to save hash work that costs ~0).
    val base = df.select(id, isTarget.cast("boolean").as("is_target"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.TokenBuckets(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
          org.apache.spark.sql.graft.ColumnBridge.expression(lit(buckets))))
        .as("bs"))
    val tokPlan = base
      .select(id, col("is_target"), explode(col("bs")).as("b"))
      .groupBy(id, col("is_target"), col("b"))
      .agg(count(lit(1)).as("m"))
    val tok = scratchDir match {
      case Some(dir) =>
        // materialize the collapsed table: tok feeds two consumers (the
        // distribution aggregate and the scoring join) and adaptive
        // exchange reuse does not deduplicate the shared subtree across
        // the broadcast boundary — without this, each consumer
        // re-tokenizes the whole corpus (measured, not theoretical)
        val p = s"$dir/dsir_tok"
        tokPlan.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => tokPlan
    }
    // BOTH distributions from one conditional aggregate over `tok` (the
    // r7 form computed the target side as tok.filter(is_target), whose
    // pushed-down filter forked the plan into a separate corpus pass).
    val dist = tok.groupBy(col("b")).agg(
      sum(col("m")).as("c_raw"),
      sum(when(col("is_target"), col("m")).otherwise(lit(0L))).as("c_tgt"))
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
