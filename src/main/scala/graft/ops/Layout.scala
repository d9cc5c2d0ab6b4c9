package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * data-skipping scans. Writing a 100 TB table z-ordered on two frequent
  * filter columns makes EACH file's min/max span a small rectangle in
  * (x, y) space, so a scan filtering on either column (or both) prunes
  * most files from the listing alone; a single-column sort only prunes on
  * that column. This is the lake-layout counterpart of the reference's
  * partition derivation (refs/partition keys, `init_or_update_table`
  * layout choices) generalized to two dimensions.
  *
  * The z-value is exact integer bit-interleaving (the classic
  * magic-number spread — Morton 1966), so it is engine-portable and
  * SQL-oracle-able; no UDF, pure codegen'd arithmetic.
  */
object Layout {

  /** Spread the low 16 bits of a non-negative long so bit i lands at bit
    * 2i (magic-number bit spreading). */
  private[graft] def spread16(c: Column): Column = {
    val x = c.bitwiseAND(lit(0xFFFFL))
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit dimensions: x takes the even
    * bits, y the odd bits. Inputs are masked to their low 16 bits (cast
    * to long first); callers map wider domains down (modulo, range
    * binning) before interleaving. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Rewrite `df` into `numFiles` range partitions of the z-value, sorted
    * within each — the write-side layout pass (pay once at ingest, save
    * on every scan). The z column is dropped from the output: layout is a
    * physical property, not data. */
  def zorderBy(df: DataFrame, x: Column, y: Column, numFiles: Int)
      : DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("_graft_z", zValue2(x, y))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
  }

  /** Per-partition (x, y) bounding boxes of a layout — the data-skipping
    * evidence: sum of box areas ≈ how much of the plane a filter must
    * touch. Diagnostic (uses spark_partition_id, engine-specific). */
  private[graft] def boundingBoxes(df: DataFrame, x: Column, y: Column)
      : DataFrame =
    df.withColumn("_pid", spark_partition_id())
      .groupBy(col("_pid"))
      .agg(min(x).as("x_min"), max(x).as("x_max"),
        min(y).as("y_min"), max(y).as("y_max"),
        count(lit(1)).as("n"))
}
