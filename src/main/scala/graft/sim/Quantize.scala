package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/bandwidth stage of
  * a large-scale embedding pipeline (a 100 TB float32 embedding lake is
  * 25 TB at int8 with ≤ scale/2 per-element error, and ANN pre-screening
  * over int8 is 4× the memory bandwidth).
  *
  * Per vector: `scale = max|x| / 127`, `q_i = clamp(⌊x_i/scale + 0.5⌋,
  * ±127)`. The rounding is written as `floor(x + 0.5)` ON PURPOSE: floor
  * over IEEE doubles is exact and bit-identical in every engine, while
  * `round()` half-way semantics differ subtly across engines (the DuckDB
  * oracle computes the same expression verbatim). All arithmetic runs in
  * float→double casts like the rest of sim/ — one narrow projection, no
  * shuffle, no UDFs.
  *
  * Zero vectors quantize to all-zero with scale 0 (guarded — no NaN). */
object Quantize {

  /** `max|x| / 127` as double — 0.0 for an all-zero vector. */
  def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** The quantized element for `x` at `scale` (long in [-127, 127]). */
  private def qElem(x: Column, scale: Column): Column =
    when(scale === 0.0, lit(0L))
      .otherwise(greatest(lit(-127L),
        least(lit(127L), floor(x.cast("double") / scale + lit(0.5)))))

  /** `array<long>` of quantized elements. (Long, not byte: the VALUES fit
    * int8 by construction; the narrow physical type is a storage-write
    * concern — `.cast("array<byte>")` at the sink.) */
  def quantized(vec: Column, scale: Column): Column =
    transform(vec, x => qElem(x, scale))

  /** Dequantized double array: `q_i · scale`. */
  def dequantized(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Per-element worst reconstruction error `max|x_i − q_i·scale|` —
    * ≤ scale/2 except at the ±127 clamp boundary. Computed from the raw
    * vector in one pass (q re-derived inline, no zip). */
  def maxError(vec: Column, scale: Column): Column =
    coalesce(array_max(transform(vec,
      x => abs(x.cast("double") - qElem(x, scale).cast("double") * scale))),
      lit(0.0))

  /** `(idCol, scale, q)` for every row — the quantization op proper. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = scaleOf(col(vecCol))
    df.select(col(idCol), s.as("scale"),
      quantized(col(vecCol), s).as("q"))
  }
}
