package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable per-group DISTINCT-COUNT state — the sketch-valued member of
  * the incremental-maintenance family ([[IncrementalAgg]] maintains
  * SUM/COUNT by signed retraction; MIN/MAX is outside plain retraction —
  * retracting the current extremum needs the runner-up, which is what
  * [[ExtremaState]]'s bounded top-k-plus-watermark state provides — and
  * COUNT(DISTINCT) is further out still: you cannot know a removed value
  * was the last occurrence without keeping the whole value
  * set). The standard scale
  * answer is a mergeable sketch: keep one HyperLogLog sketch per group as
  * state, fold each new batch in by sketch UNION, and estimate on read.
  * Union is associative/commutative, so the merged state's estimate is
  * BATCHING-INVARIANT: any split of the stream into any number of
  * batches, merged in any order, yields the identical estimate — the
  * state never drifts with batch count or arrival order (pinned by q135
  * at sparse AND dense cardinalities). One caveat, straight from the
  * DataSketches semantics: a single-pass UNMERGED sketch estimates
  * through the order-dependent HIP estimator, which a union does not
  * preserve, so a merged state's estimate need not equal a direct
  * one-shot sketch's — both sit within the same error bounds, and an
  * incremental pipeline always reads through the merge path anyway.
  * Below the sparse threshold (~512 distincts) estimates are exact.
  *
  * Built on Spark's Apache DataSketches HLL built-ins (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate`, codegen'd aggregates with
  * map-side partial merge). State is one binary column per group — plain
  * parquet, like [[IncrementalAgg]]'s state and [[graft.text.BigramModel]].
  * At 100 TB: each batch pass shuffles |groups| sketches (≤ ~1.5 KiB each
  * at the default lgK=12, fixed regardless of cardinality), the history is
  * never rescanned, and a billion-key distinct count costs kilobytes of
  * state per group with ~1.6% standard error (exact below ~512 distincts,
  * where the sketch stays in sparse mode). */
object SketchState {

  /** One batch's per-group sketch state: (groupCol, `sketch` binary). */
  def batchState(df: DataFrame, groupCol: String, valueCol: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"))

  /** Fold any number of per-group state frames into one by sketch union
    * (null-group rows merge by null-safe grouping like any other group —
    * the groupBy key equality is Spark's, which groups nulls together).
    * Mixed-lgK states fail loudly (allowDifferentLgConfigK=false): a
    * silent downgrade to the coarser sketch would quietly change the
    * error bound mid-history. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "SketchState.merge: no states")
    states.reduce(_ unionByName _)
      .groupBy(states.head.columns.head)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
  }

  /** Read side: per-group distinct estimate from the state. */
  def estimate(state: DataFrame): DataFrame =
    state.select(col(state.columns.head),
      hll_sketch_estimate(col("sketch")).as("n_approx"))
}
