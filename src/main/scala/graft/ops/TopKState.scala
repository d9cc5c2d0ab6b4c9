package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable heavy-hitter / top-k state — the frequent-items member of the
  * incremental-maintenance family (SUM/COUNT [[IncrementalAgg]], DISTINCT
  * [[SketchState]], MIN/MAX [[ExtremaState]], quantiles [[QuantileState]],
  * now top-k): maintain a bounded Misra–Gries summary of an unbounded
  * token stream across batches, so the heavy-hitter question is answered
  * without re-running the candidate pass over the whole history.
  *
  * The state is one frame: candidate rows `(token, cnt, err = null)` —
  * at most `capacity` of them, each `cnt` an MG counter undercounting the
  * token's true total — plus ONE meta row `(token = null, cnt = N,
  * err = E)` carrying the exact stream total and the accumulated MG
  * offset. Invariants (Misra & Gries 1982; merge rule per Agarwal et al.,
  * PODS'12 mergeable summaries):
  *
  *   - for a candidate: `cnt <= true <= cnt + E`;
  *   - for an absent token: `true <= E`;
  *   - `E <= N / (capacity + 1)` — every compaction that subtracts offset
  *     `v` removes at least `(capacity+1)·v` occurrences of mass.
  *
  * So with `capacity >= k`, every token with true count > N/k is in the
  * state: the candidate set is a GUARANTEED superset of the heavy
  * hitters, maintained in O(batch) per batch with O(capacity) state.
  * [[exact]] then pays ONE recount scan (the [[graft.text.HeavyHitters]]
  * pass-2) to replace bounds with exact integer counts — same output
  * contract as q131, but the expensive candidate derivation is
  * incremental instead of a second full-history scan. [[certified]]
  * answers from the state alone (no scan): `cnt·k > N` proves a hitter
  * outright since `cnt` never overcounts.
  *
  * Scale shape: a batch fold is one per-batch-vocabulary aggregate (the
  * unavoidable O(batch) work) plus a distributed top-(capacity+1)
  * threshold (`orderBy.limit` → TakeOrderedAndProject, never a full
  * sort) and a bounded driver read of ONE row; merge unions
  * ≤ capacity-row frames. No windows, no vocabulary-sized driver state,
  * nothing proportional to history depth. Determinism: compaction
  * tie-breaks on (cnt desc, token asc), so the state is a pure function
  * of the batch sequence.
  */
object TopKState {

  /** One batch folded to MG state: exact per-token batch counts,
    * compacted to ≤ `capacity` candidates. `tokens` must be a single
    * string column named `token` (nulls and empties ignored). */
  def batchState(tokens: DataFrame, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val counts = tokens
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      // bounded by the BATCH vocabulary and read three times below
      // (threshold, total, survivors) — materialize once
      .localCheckpoint(true)
    compact(counts, capacity,
      nExtra = lit(0L), errExtra = lit(0L), nFrom = Some(counts))
  }

  /** Fold state frames into one (same `capacity`): counters add per
    * token, totals and errors add, then one compaction restores the
    * bound (its offset joins the error per the mergeable-summaries
    * rule). Inputs are ≤ capacity+1 rows each, so this touches no data
    * at all — folding a new batch is `merge(Seq(state,
    * batchState(batch, capacity)), capacity)`. */
  def merge(states: Seq[DataFrame], capacity: Int): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    val all = states.reduce(_ unionByName _).localCheckpoint(true)
    val cands = all.filter(col("token").isNotNull)
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
    val meta = all.filter(col("token").isNull)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
        coalesce(sum(col("err")), lit(0L)).as("e")).head()
    compact(cands, capacity,
      nExtra = lit(meta.getLong(0)), errExtra = lit(meta.getLong(1)),
      nFrom = None)
  }

  /** MG compaction of a `(token, cnt)` frame to ≤ `capacity` rows plus
    * the meta row. `offset` = the (capacity+1)-th largest count (0 when
    * the frame already fits): subtracted from every entry, non-positives
    * dropped — removing ≥ (capacity+1)·offset mass, which is what keeps
    * the accumulated error ≤ N/(capacity+1). The threshold read is a
    * distributed top-(capacity+1) and ONE driver row. */
  private def compact(counts: DataFrame, capacity: Int,
      nExtra: org.apache.spark.sql.Column,
      errExtra: org.apache.spark.sql.Column,
      nFrom: Option[DataFrame]): DataFrame = {
    val top = counts.orderBy(col("cnt").desc, col("token").asc)
      .limit(capacity + 1)
      .agg(count(lit(1)).as("m"), min(col("cnt")).as("kth")).head()
    val offset = if (top.getLong(0) == capacity + 1L) top.getLong(1) else 0L
    val survivors = counts.filter(col("cnt") > lit(offset))
      .select(col("token"), (col("cnt") - lit(offset)).as("cnt"),
        lit(null).cast("long").as("err"))
    val nBatch = nFrom match {
      case Some(f) => f.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
      case None => 0L
    }
    val meta = counts.sparkSession.range(1).select(
      lit(null).cast("string").as("token"),
      (lit(nBatch) + nExtra).as("cnt"),
      (lit(offset) + errExtra).as("err"))
    survivors.unionByName(meta)
  }

  // ------------------------------------------------------------- grouped
  // The per-group variant (top tokens per language / shard / domain):
  // identical MG invariants per group, with N, error and the capacity
  // bound all PER GROUP. Compaction thresholds come from one window
  // partitioned by the group — bounded per group by the BATCH vocabulary
  // (the same O(batch) caveat as batchState) and parallel across groups,
  // never a global sort.

  /** One batch folded to per-group MG state: `(group, token, cnt, err)`
    * candidate rows (≤ capacity per group) plus one meta row per group
    * (`token = null`, `cnt` = exact group total, `err` = offset). */
  def batchStateBy(tokens: DataFrame, groupCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val g = col(groupCol)
    val counts = tokens
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy(g, col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    compactBy(counts, groupCol, capacity, extras = None)
  }

  /** Fold per-group state frames into one — counters add per (group,
    * token), totals/errors add per group, one compaction per group
    * restores the bound. Inputs are state-sized; no data touched. */
  def mergeBy(states: Seq[DataFrame], groupCol: String,
      capacity: Int): DataFrame = {
    require(states.nonEmpty, "merge of zero states")
    val all = states.reduce(_ unionByName _).localCheckpoint(true)
    val cands = all.filter(col("token").isNotNull)
      .groupBy(col(groupCol), col("token")).agg(sum(col("cnt")).as("cnt"))
    val extras = all.filter(col("token").isNull)
      .groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("__n0"), sum(col("err")).as("__e0"))
    compactBy(cands, groupCol, capacity, Some(extras))
  }

  /** Per-group MG compaction: the (capacity+1)-th largest count per
    * group via ONE group-partitioned window over the counts frame
    * (bounded per group, parallel across groups). */
  private def compactBy(counts: DataFrame, groupCol: String, capacity: Int,
      extras: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(groupCol)
    val w = Window.partitionBy(g)
      .orderBy(col("cnt").desc, col("token").asc)
    val ranked = counts.withColumn("__rn", row_number().over(w))
    val perGroup = ranked.groupBy(g).agg(
      coalesce(max(when(col("__rn") === capacity + 1, col("cnt"))), lit(0L))
        .as("__off"),
      sum(col("cnt")).as("__nb"))
    val withMeta = extras match {
      // merged totals come ONLY from the meta rows — candidate counters
      // undercount, so __nb is not the group total here
      case Some(e) => perGroup.join(e, Seq(groupCol), "left")
        .select(g, col("__off"),
          coalesce(col("__n0"), lit(0L)).as("__n"),
          coalesce(col("__e0"), lit(0L)).as("__e"))
      case None => perGroup.select(g, col("__off"),
        col("__nb").as("__n"), lit(0L).as("__e"))
    }
    val meta = withMeta.select(g, lit(null).cast("string").as("token"),
      col("__n").as("cnt"), (col("__off") + col("__e")).as("err"))
    val survivors = ranked.join(broadcast(withMeta.select(g, col("__off"))),
        Seq(groupCol))
      .filter(col("cnt") > col("__off"))
      .select(g, col("token"), (col("cnt") - col("__off")).as("cnt"),
        lit(null).cast("long").as("err"))
    survivors.unionByName(meta)
  }

  /** Exact per-group heavy hitters (`true count · k > N_group`) from the
    * maintained state plus ONE recount scan — the grouped q131 contract.
    * `capacity >= k` per group is the superset guarantee. */
  /** The grouped recount pre-checkpoint — exposed so the spec can
    * plan-assert its shape (candidates broadcast into a LeftOuter join;
    * the token stream never shuffles on (group, token); non-candidates
    * fold into the per-group null bucket that also yields N_group). */
  private[graft] def groupedRecount(tokens: DataFrame, state: DataFrame,
      groupCol: String): DataFrame = {
    val g = col(groupCol)
    val cands = state.filter(col("token").isNotNull)
      .select(g, col("token")).withColumn("__cand", lit(true))
    tokens.filter(col("token") =!= "")
      .join(broadcast(cands), Seq(groupCol, "token"), "left")
      .groupBy(g, when(col("__cand"), col("token")).as("token"))
      .agg(count(lit(1)).as("n"))
  }

  def exactBy(state: DataFrame, tokens: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val g = col(groupCol)
    val counted = groupedRecount(tokens, state, groupCol)
      .localCheckpoint(true)
    val totals = counted.groupBy(g).agg(sum(col("n")).as("__total"))
    counted.where(col("token").isNotNull)
      .join(broadcast(totals), Seq(groupCol))
      .where(col("n") * k > col("__total"))
      .select(g, col("token"), col("n"))
  }

  /** Hitters PROVEN by the state alone — zero scans: `cnt` never
    * overcounts, so `cnt · k > N` certifies true count > N/k. The set is
    * complete up to the error bound (a true hitter with `cnt` depressed
    * by up to E may be missing here but is always in the candidate set);
    * [[exact]] closes the gap with one scan. */
  def certified(state: DataFrame, k: Int): DataFrame = {
    val meta = state.filter(col("token").isNull)
      .select(col("cnt")).collect().headOption.getOrElse(
        throw new IllegalArgumentException(
          "TopKState.certified: no meta row (token = null) in the state " +
            "frame — pass batchState/merge output, not raw counts"))
    state.filter(col("token").isNotNull)
      .filter(col("cnt") * k > lit(meta.getLong(0)))
      .select(col("token"), col("cnt").as("cnt_lower"))
  }

  /** Exact heavy hitters (`true count · k > N`) from the maintained
    * state plus ONE recount scan of the stream — q131's output contract
    * with the candidate pass amortized across the folds. `capacity >= k`
    * is the superset guarantee's requirement. */
  def exact(state: DataFrame, tokens: DataFrame, k: Int): DataFrame = {
    val cands = state.filter(col("token").isNotNull).select(col("token"))
    val counted = graft.text.HeavyHitters
      .recount(tokens.filter(col("token") =!= ""), cands, k)
      .localCheckpoint(true)
    val total = counted.groupBy().agg(sum(col("n")).as("__total"))
    counted.where(col("token").isNotNull)
      .crossJoin(broadcast(total))
      .where(col("n") * k > col("__total"))
      .select(col("token"), col("n"))
  }
}
