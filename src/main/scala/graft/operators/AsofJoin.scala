package graft.operators

import org.apache.spark.sql.DataFrame
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
  * as-of semantics; for that regime pre-bucket by (key, coarse time range)
  * and run this within buckets.
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
}
