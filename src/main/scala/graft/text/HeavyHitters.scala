package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded token stream in two bounded-memory
  * passes — the scale-correct alternative to `GROUP BY token` when the
  * vocabulary itself is too large to shuffle.
  *
  * A full-vocabulary `groupBy("token").count()` (the q85 shape) shuffles one
  * partial count per DISTINCT token per map task; over 100 TB of web text
  * the vocabulary is billions of strings (typos, ids, urls) and the shuffle
  * is corpus-sized. But the usual question — "which tokens exceed p% of the
  * corpus?" — has a bounded answer (< 1/p tokens can exceed a p fraction),
  * and Misra–Gries answers it in O(k) memory per partition:
  *
  *   - Pass 1 ([[candidates]]): each partition runs a k-counter
  *     Misra–Gries summary over its tokens. MG's guarantee: any item with
  *     in-partition count > n_p/(k+1) survives the summary. Summing the
  *     per-partition bounds, any token with GLOBAL count > N/(k+1) — in
  *     particular anything above N/k — appears in at least one partition's
  *     summary, so the union of summaries is a guaranteed superset of the
  *     heavy hitters. The shuffle is ≤ k·partitions short strings, corpus-
  *     size-independent.
  *   - Pass 2 ([[exact]]): one more scan recounts ONLY the candidates
  *     (every non-candidate collapses into a single null group that also
  *     yields the exact total N), and the > N/k filter runs on exact
  *     integer counts. No approximation survives to the output.
  *
  * Both passes are one narrow scan + one bounded shuffle; nothing is
  * proportional to vocabulary size. The MG loop is genuine per-partition
  * imperative state, hence the one `mapPartitions` (amortized O(1)/token:
  * each eviction round removes k+1 occurrences from the remaining budget,
  * so at most n/(k+1) rounds of O(k) work).
  *
  * Counterpart of the reference's frequency profiling (the vendor export
  * pipeline's per-table counts) lifted to token granularity; threshold
  * semantics follow Misra & Gries (1982) / the MG summary in Cormode's
  * survey of frequency sketches.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries candidate tokens (capacity k per partition).
    * Output is the distinct union of partition summaries: a guaranteed
    * superset of every token with global count > N/(k+1). */
  def candidates(tokens: Dataset[String], k: Int): DataFrame = {
    require(k >= 1, s"heavy-hitter capacity must be >= 1, got $k")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            // eviction round: decrement all k counters, drop the zeros
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (w, c) =>
              if (c == 1L) dead += w else counters.update(w, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
  }

  /** The recount aggregation pre-checkpoint — exposed so the spec can
    * plan-assert its shape (candidates broadcast into a LeftOuter
    * BroadcastHashJoin; the token stream itself NEVER shuffles on token;
    * the only token-stream exchange carries ≤ k·partitions + 1 partial
    * groups): candidate tokens keep their identity, every other token
    * folds into the null group, so one aggregation yields the exact
    * candidate counts AND the exact stream total N (sum over all
    * groups). */
  private[graft] def recount(tokens: DataFrame, cands: DataFrame,
      k: Int): DataFrame =
    tokens
      .join(broadcast(cands.withColumn("__cand", lit(true))),
        Seq("token"), "left")
      .groupBy(when(col("__cand"), col("token")).as("token"))
      .agg(count(lit(1)).as("n"))

  /** Exact counts of every token whose global count strictly exceeds
    * `N / k` (integer-exact: `count * k > N`), as `(token, n)`.
    *
    * `tokens` must be a single string column named `token`. Two scans of
    * the stream; all shuffles bounded by k·partitions candidates. The two
    * passes RE-EXECUTE the input plan — if `tokens` is derived (e.g. an
    * explode over a tokenizer), pass a materialized frame (parquet / a
    * checkpoint) instead, or the derivation cost is paid twice and
    * dominates: at the ×100 bench scale tokenization is ~24 s/pass while
    * each MG pass over materialized tokens is a fraction of that. */
  def exact(tokens: DataFrame, k: Int): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val cands = candidates(tokens.select(col("token")).as[String], k)
    // The counted frame is bounded and feeds two consumers (the total and
    // the filter), so it is eagerly checkpointed — the AggOps pattern —
    // instead of re-running the recount scan per consumer.
    val counted = recount(tokens, cands, k)
      .localCheckpoint(true)
    val total = counted.groupBy().agg(sum(col("n")).as("__total"))
    counted
      .where(col("token").isNotNull)
      .crossJoin(broadcast(total)) // 1-row frame: the exact stream total
      .where(col("n") * k > col("__total"))
      .select(col("token"), col("n"))
  }
}
