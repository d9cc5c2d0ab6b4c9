package graft.curate

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  * Scale shape — the whole computation is VECTORS, not rows: each doc's
  * feature distribution is one dense `buckets`-slot count vector emitted
  * by the fused [[graft.functions.TokenBucketCounts]] kernel in a single
  * corpus pass. The two bucket distributions are ONE element-wise
  * vector-sum aggregate over those vectors (a two-phase Aggregator: the
  * shuffle carries one `buckets`-long buffer per partition per flag value,
  * never the corpus), collected to the driver as 2×`buckets` longs; the
  * per-bucket log ratios are computed driver-side (pure math over ≤
  * `buckets` values) and re-enter the plan as a LITERAL array, so the
  * score is a per-row dot product — no explode, no per-(doc, bucket)
  * shuffle, no scoring join, no final left join (a token-less doc's zero
  * vector scores 0.0 by arithmetic). The per-doc vector table is
  * materialized once (localCheckpoint, or parquet under `scratchDir`) so
  * the corpus is tokenized exactly once across the distribution pass and
  * the scoring pass. Earlier shapes and their measurements (the collapsed
  * (doc, bucket, multiplicity) table + broadcast join; the pre-kernel
  * regex tokenizer) are in git history — the vector shape removed the two
  * remaining shuffles and the 256-row broadcast join from the plan.
  *
  * Exactness contract: feature hashing reuses [[Sampling.bucket32]]'s
  * md5-prefix bucketing (identical in any engine with md5); the counts are
  * exact integers; the per-bucket ratio is the identical
  * `ln((c+α)/(t+αB))` double expression as before (driver vs executor
  * evaluation of the same IEEE ops); `ln` is the one transcendental, so
  * cross-engine oracles compare the final weight at fixed precision
  * (`round(score, 6)` both sides — the q99 contract).
  */
object Dsir {

  /** Element-wise sum of dense `Array[Int]` count vectors into
    * `Array[Long]` — two-phase (partial per partition, buffers merged), so
    * the shuffle carries one vector per partition per group. */
  private object IntVectorSum
      extends Aggregator[Array[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Int]): Array[Long] = {
      if (a == null) return b
      val s = if (b.isEmpty) new Array[Long](a.length) else b
      var i = 0
      while (i < a.length) { s(i) += a(i); i += 1 }
      s
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.isEmpty) return y
      if (y.isEmpty) return x
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-document importance weights against the rows where `isTarget` is
    * true. Output: (idCol, is_target, n_tokens, logw) with `logw` the SUM
    * of per-token log probability ratios (0.0 for token-less docs; target
    * docs score themselves like any raw doc — DSIR resamples from the raw
    * pool, the flag is provenance).
    *
    * `scratchDir`: where the per-doc count-vector table materializes.
    * None (default) uses `localCheckpoint` — executor memory/disk, right
    * for anything the cluster's storage fraction holds. A scratch dir
    * writes it as parquet instead: at 100 TB the vector table is
    * `docs × 4·buckets` bytes — far smaller than the text, but bigger
    * than you want pinned in the block manager. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, alpha: Double = 1.0,
      scratchDir: Option[String] = None): DataFrame = {
    require(buckets >= 2, s"need >= 2 feature buckets, got $buckets")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val id = col(idCol)
    val plan = df.select(id, isTarget.cast("boolean").as("is_target"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.TokenBucketCounts(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
          org.apache.spark.sql.graft.ColumnBridge.expression(lit(buckets))))
        .as("cv"))
    // materialize ONCE: the distribution aggregate and the scoring pass
    // both read the vectors; without this each would re-tokenize the text
    val base = scratchDir match {
      case Some(dir) =>
        val p = s"$dir/dsir_cv"
        plan.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => plan.localCheckpoint(true)
    }
    // one vector-sum aggregate; ≤ 3 driver rows (true / false / null flag)
    val sums = base.groupBy(col("is_target"))
      .agg(udaf(IntVectorSum).apply(col("cv")).as("s"))
      .collect()
    val cRaw = new Array[Long](buckets)
    val cTgt = new Array[Long](buckets)
    sums.foreach { r =>
      val s = r.getSeq[Long](1)
      if (s.nonEmpty) {
        val tgt = !r.isNullAt(0) && r.getBoolean(0)
        var i = 0
        while (i < buckets) {
          cRaw(i) += s(i)
          if (tgt) cTgt(i) += s(i)
          i += 1
        }
      }
    }
    var tRaw = 0L; var tTgt = 0L
    var i = 0
    while (i < buckets) { tRaw += cRaw(i); tTgt += cTgt(i); i += 1 }
    val aB = alpha * buckets
    // identical IEEE expression to the in-plan form this replaced:
    // ln((c_tgt+α)/(t_tgt+αB)) − ln((c_raw+α)/(t_raw+αB)) per bucket
    val ratio = Array.tabulate(buckets) { b =>
      math.log((cTgt(b).toDouble + alpha) / (tTgt.toDouble + aB)) -
        math.log((cRaw(b).toDouble + alpha) / (tRaw.toDouble + aB))
    }
    val rLit = typedLit(ratio)
    base.select(id, col("is_target"),
      coalesce(aggregate(col("cv"), lit(0L),
        (acc, x) => acc + x.cast("long")), lit(0L)).as("n_tokens"),
      coalesce(aggregate(zip_with(col("cv"), rLit,
          (c, r) => c.cast("double") * r), lit(0.0),
        (acc, x) => acc + x), lit(0.0)).as("logw"))
  }
}
