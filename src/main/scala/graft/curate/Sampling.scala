package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation: flat-rate
  * hash sampling, per-stratum rate maps, and mixture rebalancing (sample
  * each source/language down to target proportions).
  *
  * Sampling a 100 TB corpus with `rand()` is wrong twice: re-runs pick a
  * different subset (so the pipeline is not idempotent and downstream
  * caches/dedups churn), and no independent engine can reproduce the
  * choice (so there is no oracle). Every sampler here instead derives a
  * bucket in [0, 10000) from the **md5 of a caller-chosen key**, giving:
  * idempotent re-runs, portable decisions (any engine with md5 picks the
  * same rows — the DuckDB oracle pins the exact sampled set), and
  * per-stratum rates as plain integer thresholds. md5 is a codegen'd
  * built-in (no UDF); the plan is a pure map-side filter — zero shuffle,
  * full pushdown of everything below it, scales linearly with the scan.
  */
object Sampling {

  /** Fixed bucket denominator: rates quantize to 1/10000ths, thresholds
    * are exact integers (no float comparison at the row level). */
  val Buckets = 10000

  /** The first 32 bits of `md5(key)` as a long — the shared deterministic
    * randomness source ([[bucket]] reduces it; [[Shuffle]] sorts by it).
    * Key is canonicalized through a string cast so every engine hashes
    * the same bytes (`'42'`, not an int encoding). A NULL key would hash
    * to NULL and fail every `<` threshold — rows silently vanishing from
    * every sample — so it raises instead: sampling keys are identities,
    * and a null identity is corrupt input to quarantine upstream. */
  def bucket32(key: Column): Column = {
    val k = coalesce(key.cast("string"),
      raise_error(lit("Sampling: NULL sampling key — null identities must " +
        "be quarantined before sampling, not silently dropped")))
    conv(substring(md5(k.cast("binary")), 1, 8), 16, 10).cast("long")
  }

  /** Deterministic bucket in [0, `Buckets`). */
  def bucket(key: Column): Column = bucket32(key) % Buckets

  /** Keep a deterministic ~`rate` fraction of rows, decided per-key. */
  def sample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"sample: rate must be in [0,1], got $rate")
    df.filter(bucket(key) < math.round(rate * Buckets).toInt)
  }

  /** Deterministic train/test split: every key lands in exactly one side,
    * decided by its md5 bucket — re-runs, other engines, and later batches
    * of the same corpus all agree, so the held-out set never leaks into
    * training by nondeterminism. Returns the frame with a `split` column
    * (`test` for ~`testFrac`, else `train`). */
  def split(df: DataFrame, key: Column, testFrac: Double): DataFrame = {
    require(testFrac >= 0 && testFrac <= 1,
      s"split: testFrac must be in [0,1], got $testFrac")
    val thr = math.round(testFrac * Buckets).toInt
    df.withColumn("split",
      when(bucket(key) < thr, lit("test")).otherwise(lit("train")))
  }

  /** Per-stratum sampling rates (e.g. downweight `en`, keep all of `zh`).
    * The rate map rides along as a literal MAP expression — no join, no
    * shuffle, one codegen'd filter. Strata missing from `rates` fall back
    * to `defaultRate`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, key: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"stratifiedSample: rate $r outside [0,1]"))
    val thr = rates.map { case (k, v) => k -> math.round(v * Buckets).toInt }
    val thrCol = coalesce(
      element_at(typedLit(thr), col(stratumCol)),
      lit(math.round(defaultRate * Buckets).toInt))
    df.filter(bucket(key) < thrCol)
  }

  /** Downsample each domain to a TOKEN budget (not a row budget): with a
    * total budget of `budgetFrac` × corpus tokens split across domains in
    * proportion to `weight` (any per-domain expression — must be constant
    * within a domain), each domain keeps a deterministic
    * `min(1, budget·w_d / (Σw · tokens_d))` fraction of its documents.
    * Training mixtures are specified in TOKENS (a domain of long documents
    * must sample harder than one with the same row count of tweets);
    * [[rebalanceToMixture]] is the row-count analog.
    *
    * Plan shape at 100 TB: one partial-agg token sum per domain (the only
    * corpus shuffle, cardinality = |domains|), a 1-row total aggregated
    * from that bounded frame, thresholds broadcast back — the corpus
    * stream itself is filtered map-side by its md5 bucket and never
    * shuffles. Note the kept fraction is of each domain's DOCUMENTS;
    * kept tokens track the budget exactly in expectation, with per-domain
    * deviation bounded by document-length variance (exact-token packing is
    * [[graft.curate.Packing]]'s job downstream).
    *
    * A NULL domain raises, for the same reason [[bucket32]] raises on a
    * NULL key: the budget join would otherwise silently drop the row
    * (inner-join on a null key never matches), and a document with no
    * domain is corrupt input to quarantine upstream, not a sampling
    * decision. */
  def sampleToTokenBudget(df: DataFrame, domainCol: String, tokensCol: Column,
      key: Column, budgetFrac: Double, weight: Column): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"sampleToTokenBudget: budgetFrac must be in (0,1], got $budgetFrac")
    val guarded = df.withColumn(domainCol, coalesce(col(domainCol),
      raise_error(lit("Sampling: NULL domain — domainless documents must " +
        "be quarantined before budget sampling, not silently dropped"))))
    val stats = guarded.groupBy(col(domainCol).as("__domain"))
      .agg(sum(tokensCol).as("__toks"), max(weight.cast("double")).as("__w"))
    val totals = stats.agg(sum(col("__toks")).cast("double").as("__tt"),
      sum(col("__w")).as("__sw"))
    val thresholds = stats.crossJoin(broadcast(totals))
      .select(col("__domain"),
        floor(least(lit(1.0),
          lit(budgetFrac) * col("__tt") * col("__w") / col("__sw")
            / col("__toks")) * Buckets).cast("long").as("__thr"))
    guarded.join(broadcast(thresholds), col(domainCol) === col("__domain"))
      .filter(bucket(key) < col("__thr"))
      .drop("__domain", "__thr")
  }

  /** Rebalance the corpus to target mixture proportions by downsampling
    * every stratum proportionally as far as possible without upsampling:
    * with normalized weights `w_s`, the largest total `T` satisfying
    * `T * w_s <= count_s` for every stratum is `T = min(count_s / w_s)`,
    * giving per-stratum rates `w_s * T / count_s <= 1`. Strata absent
    * from `targets` are dropped (rate 0) — rebalancing defines the
    * mixture, so an unlisted source is excluded, loudly visible in the
    * result counts (a NULL stratum falls in the same bucket: it matches
    * no target, so its rows are excluded like any other unlisted source).
    *
    * Plan shape at 100 TB: one partial-agg count per stratum (the only
    * shuffle, cardinality = |strata|), a tiny threshold table derived
    * from it and broadcast back — the corpus stream itself is filtered
    * map-side and never shuffles. Deterministic md5 buckets make the
    * rebalanced corpus reproducible run-over-run and engine-over-engine. */
  def rebalanceToMixture(df: DataFrame, stratumCol: String, key: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "rebalanceToMixture: empty target mixture")
    targets.foreach { case (k, v) =>
      require(v > 0, s"rebalanceToMixture: weight for '$k' must be > 0, got $v") }
    val total = targets.values.sum
    val w = typedLit(targets.map { case (k, v) => k -> v / total })

    val counts = df.groupBy(col(stratumCol).as("__stratum"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", element_at(w, col("__stratum")))
      .filter(col("__w").isNotNull) // unlisted strata: dropped below
    val tMax = counts.agg(min(col("__cnt") / col("__w")).as("__t"))
    val thresholds = counts.crossJoin(broadcast(tMax))
      .select(col("__stratum"),
        floor(least(lit(1.0), col("__w") * col("__t") / col("__cnt"))
          * Buckets).cast("long").as("__thr"))

    df.join(broadcast(thresholds), col(stratumCol) === col("__stratum"))
      .filter(bucket(key) < col("__thr"))
      .drop("__stratum", "__thr")
  }
}
