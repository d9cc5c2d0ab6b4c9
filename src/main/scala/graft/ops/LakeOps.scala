package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational transforms of the CDC-lake pipeline, re-expressed as
  * composable DataFrame operators.
  *
  * Reference semantics (see SURVEY.md §2.2/§2.5):
  *  - partition derivation: `glue_jobs/initial_load.py:129-150`
  *    (duplicated `glue_jobs/incremental.py:189-209`)
  *  - latest-wins dedup:    `glue_jobs/incremental.py:172-183`
  *  - Op-column drop:       `glue_jobs/incremental.py:210`
  *  - compare normalization: `rds_to_datalake/compare.py:38-48`
  *
  * All operators are narrow (no shuffle) except [[latestWinsDedup]], which
  * shuffles once on the record key — the minimum any keyed conflict
  * resolution needs. At 100 TB the dedup shuffle is bounded by the CDC batch
  * size (MBs–GBs), never the table size.
  */
object LakeOps {

  /** The reference's 5-level time partitioning scheme (README.rst:160-167). */
  val partitionCols: Seq[String] =
    Seq("create_year", "create_month", "create_day", "create_hour", "create_minute")

  private val partitionSlices: Seq[(String, (Int, Int))] = Seq(
    "create_year"   -> (1, 4),
    "create_month"  -> (6, 2),
    "create_day"    -> (9, 2),
    "create_hour"   -> (12, 2),
    "create_minute" -> (15, 2))

  /** Derive the five zero-padded partition columns from an ISO-8601 string
    * timestamp column, with the exact substring positions the reference uses
    * (`initial_load.py:129-150`): (1,4) (6,2) (9,2) (12,2) (15,2).
    * Pure projections — fully codegen'd, no shuffle, and partition pruning
    * on the resulting columns is free once the table is written
    * `partitionBy(partitionCols)`.
    */
  def derivePartitionColumns(df: DataFrame, tsCol: String = "create_at"): DataFrame =
    partitionSlices.foldLeft(df) { case (d, (name, (pos, len))) =>
      d.withColumn(name, substring(col(tsCol), pos, len))
    }

  /** Latest-wins dedup — the reference's signature operator
    * (`incremental.py:172-183`): `row_number() OVER (PARTITION BY key ORDER
    * BY precombine DESC)`, keep rank 1. One row per key survives, the one
    * with the greatest precombine value.
    *
    * `tieBreak` columns order rows with *equal* precombine values (the
    * reference leaves this arbitrary; Hudi's precombine keeps the incoming
    * row — pass a priority column from the merge sink to reproduce that).
    */
  def latestWinsDedup(df: DataFrame, keys: Seq[String], precombine: String,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(precombine).desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Skew-safe two-phase latest-wins: when one record key dominates a batch
    * (a hot entity at 100 TB), the single-window dedup funnels that key's
    * rows through one task. Phase 1 dedups within (key, salt) — the salt is
    * a deterministic hash of the ordering columns, so the per-key argmax is
    * preserved — phase 2 resolves the ≤`saltBuckets` survivors per key.
    * Identical result to [[latestWinsDedup]] for any total per-key order;
    * shuffle fan-out bounded by `saltBuckets` per key. */
  def latestWinsDedupSalted(df: DataFrame, keys: Seq[String], precombine: String,
      tieBreakCols: Seq[String] = Nil, saltBuckets: Int = 16): DataFrame = {
    val orderCols = (precombine +: tieBreakCols).map(col)
    val tieBreak = tieBreakCols.map(c => col(c).desc)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(orderCols: _*), lit(saltBuckets)))
    latestWinsDedup(
      latestWinsDedup(salted, keys :+ "__salt", precombine, tieBreak),
      keys, precombine, tieBreak)
      .drop("__salt")
  }

  /** Drop the CDC operation marker column (`incremental.py:210`). */
  def dropOp(df: DataFrame): DataFrame = df.drop("Op")

  /** P3 — skip delete events: the reference's stream consumer drops REMOVE
    * records because deletes are intentionally out of scope
    * (`dynamodb_stream_consumer.py:38-39`, `README.rst:53`). */
  def filterRemoves(df: DataFrame, opCol: String = "Op"): DataFrame =
    df.filter(col(opCol) =!= "REMOVE")

  /** Drop derived partition columns and engine meta columns before the
    * source-vs-lake equality compare (`compare.py:38-48`). */
  def normalizeForCompare(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(c =>
      partitionCols.contains(c) || c.startsWith("_hoodie")): _*)
}
