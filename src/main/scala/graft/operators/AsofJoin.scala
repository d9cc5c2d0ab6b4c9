package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the CDC-lake companion query: attach to
  * each fact row the LATEST state of its dimension key at-or-before the
  * fact's timestamp ("what did this row look like when the event
  * happened"). Spark has no native ASOF JOIN; the usual range-join
  * spelling explodes to |facts|×|dim versions| per key before filtering.
  * This one is the union–carry-forward form: tag both sides, sort each key
  * by (ts, side) with dims first on ties ("at or before" includes equal
  * timestamps), and carry the last non-null dim payload forward — one
  * shuffle on the key, one per-key sorted pass, NO pair blow-up.
  *
  * Scale shape: a key-partitioned window, scale-safe when the key is
  * high-cardinality (users/rows — the CDC case). A handful of giant keys
  * degrade to per-key sequential scans — the inherent order dependence of
  * as-of semantics; for that regime [[asofBucketed]] pre-buckets by
  * (key, coarse time range) with per-bucket carry-in state, so a hot
  * key's timeline parallelizes across its buckets.
  *
  * Determinism contract: at most ONE dim row per (key, ts) — pre-collapse
  * duplicates (e.g. `max(struct(...))` by a unique column) or the carried
  * state is sort-order dependent.
  */
object AsofJoin {

  /** Left as-of join: every fact row survives; `payloadCols` (from `dims`)
    * arrive null when the key has no dim version at-or-before the fact.
    * `facts` and `dims` must both have `keyCol` + `tsCol`; payload names
    * must not collide with fact column names. */
  def asof(facts: DataFrame, dims: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val factStruct = struct(facts.columns.map(col): _*)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = dims.select(payloadStruct).schema.head.dataType
    val factType = facts.select(factStruct).schema.head.dataType
    val dimSide = dims.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      payloadStruct.as("__p"), lit(null).cast(factType).as("__f"))
    val factSide = facts.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__p"), factStruct.as("__f"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = dimSide.union(factSide)
      .withColumn("__state", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    carried.select(
      facts.columns.map(c => col(s"__f.$c").as(c)) ++
        payloadCols.map(c => col(s"__state.$c").as(c)): _*)
  }

  /** [[asof]] for SKEWED keys: one entity holding millions of dim versions
    * would serialize [[asof]]'s key-partitioned sorted pass onto one task.
    * Here the timeline is pre-bucketed by `bucket(ts)` — any expression
    * MONOTONIC in the timestamp (e.g. `ts div width`, a date truncation) —
    * and the sorted pass runs per (key, bucket), so a hot key spreads over
    * as many tasks as it spans buckets. Same result as [[asof]], same
    * determinism contract, plus: `tsCol` must be non-null on both sides
    * (the in-bucket seed row sorts via a null timestamp).
    *
    * Two-level construction (both levels are the union–carry-forward
    * trick, never a pair blow-up):
    *  1. BUCKET level: collapse dims to their latest payload per
    *     (key, bucket) — a partial-agg'd groupBy — then carry that
    *     forward over each key's BUCKET sequence (rows per key = distinct
    *     buckets, small by construction) with facts sorting BEFORE dims
    *     on a tied bucket, yielding each fact-bucket's carry-in: the
    *     key's latest payload from any STRICTLY earlier bucket.
    *  2. ROW level: within each (key, bucket) partition, seed the sorted
    *     carry-forward with that carry-in (a synthetic row sorting before
    *     every real timestamp), so in-bucket facts see earlier-bucket
    *     state without scanning it. */
  def asofBucketed(facts: DataFrame, dims: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      bucket: Column => Column): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val factStruct = struct(facts.columns.map(col): _*)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = dims.select(payloadStruct).schema.head.dataType
    val factType = facts.select(factStruct).schema.head.dataType
    val dimSide = dims.select(
      col(keyCol).as("__k"), bucket(col(tsCol)).as("__b"),
      col(tsCol).as("__ts"), lit(0).as("__side"),
      payloadStruct.as("__p"), lit(null).cast(factType).as("__f"))
    val factSide = facts.select(
      col(keyCol).as("__k"), bucket(col(tsCol)).as("__b"),
      col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__p"), factStruct.as("__f"))

    // ---- bucket level: latest dim payload per (key, bucket)…
    val dimB = dimSide
      .groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__p"), col("__ts")).as("__p"))
    // …carried forward over the key's bucket sequence. Facts sort BEFORE
    // dims on a tied bucket (__bside 0 < 1): the carry-in must hold only
    // STRICTLY-earlier-bucket state — same-bucket dims are re-examined at
    // row level, where the at-or-before tie rule applies.
    val factB = factSide.select(col("__k"), col("__b")).distinct()
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__b"), col("__bside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryIn = dimB
      .select(col("__k"), col("__b"), lit(1).as("__bside"), col("__p"))
      .unionByName(factB.select(col("__k"), col("__b"),
        lit(0).as("__bside"), lit(null).cast(payloadType).as("__p")))
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(wB))
      .where(col("__bside") === 0 && col("__carry").isNotNull)

    // ---- row level: per-(key, bucket) sorted pass, seeded with carry-in
    // (null ts + ascNullsFirst ⇒ the seed sorts before every real row)
    val seeds = carryIn.select(col("__k"), col("__b"),
      lit(null).cast(dimSide.schema("__ts").dataType).as("__ts"),
      lit(-1).as("__side"), col("__carry").as("__p"),
      lit(null).cast(factType).as("__f"))
    val wR = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts").asc_nulls_first, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = dimSide.unionByName(factSide).unionByName(seeds)
      .withColumn("__state", last(col("__p"), ignoreNulls = true).over(wR))
      .where(col("__side") === 1)
    carried.select(
      facts.columns.map(c => col(s"__f.$c").as(c)) ++
        payloadCols.map(c => col(s"__state.$c").as(c)): _*)
  }
}
