package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional clustering via Morton (Z-order) interleaving — the
  * `OPTIMIZE ... ZORDER BY (a, b)` layout tool of the Delta/Iceberg world,
  * for tables queried through MORE THAN ONE predicate column. Linear
  * clustering ([[graft.sink.VersionedLakeTable]]'s `clusterBy`) gives one
  * column tight per-file min/max ranges and leaves every other column's
  * ranges as wide as the table; interleaving the top `bits` bits of each
  * column's normalized value makes files contiguous in z-space, so EVERY
  * z-column's per-file range is narrow (≈ value-span / 2^(bits_spent))
  * and the file-level stats index ([[graft.sink.FileStatsIndex]]) — plus
  * parquet's own row-group min/max inside each file — prunes predicates
  * on ANY of them. The classic trade: each dimension added halves the
  * per-dimension resolution; 2-4 z-columns is the useful regime.
  *
  * Layering: [[Layout]] is the exact integer interleave KERNEL (2-D
  * magic-number spread, caller-owned binning — SQL-oracle-able, pinned
  * by q116); this object is the self-normalizing MAINTENANCE layer above
  * it — it derives each column's bucket from the data's own min/max
  * frame, handles null/NaN corners, generalizes to >2 columns, and
  * drives [[graft.sink.VersionedLakeTable.optimizeZOrder]]'s rewrite.
  * The 2-column case delegates to [[Layout.zValue2]].
  *
  * Scale shape: one min/max aggregate over the input (driver gets one
  * 2·|cols|-value row — the normalization frame), then a range
  * repartition on the z-value (sampled, like any repartitionByRange) and
  * an in-task sort. No windows, no driver data, no all-pairs: the rewrite
  * is the same shuffle+sort a sorted write costs, which is why it is a
  * pay-once maintenance op, not a per-query one.
  *
  * Exactness contract: the z-value orders the LAYOUT only — query results
  * never depend on it (pruned reads re-apply the exact predicate as a
  * residual filter), so the double-precision normalization here needs no
  * cross-engine determinism. Null/NaN values land in bucket 0 / the top
  * bucket respectively, keeping them clustered rather than scattered.
  */
object ZOrder {

  /** The interleaved z-value of `cols` over `df`'s value ranges: each
    * column is normalized to a `bits`-bit bucket by min/max scaling (ONE
    * aggregate job over `df` computes the frame), then bit `j` of column
    * `i` lands at position `j * |cols| + i`. Total bits must fit a long's
    * positive range: `bits * |cols| <= 62`. Supported column types:
    * integral, floating, decimal, date, timestamp. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    require(cols.size >= 2,
      s"z-order needs >= 2 columns (use clusterBy for 1), got $cols")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must be in [1, 62], got $bits * ${cols.size}")
    val schema = df.schema
    val asDouble: Map[String, Column] = cols.map { c =>
      val dt = schema(c).dataType
      val d = dt match {
        case ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | (_: DecimalType) =>
          col(c).cast("double")
        case DateType => col(c).cast("int").cast("double")
        case TimestampType | TimestampNTZType =>
          col(c).cast("long").cast("double")
        case other => throw new IllegalArgumentException(
          s"z-order column $c has unsupported type $other " +
            "(supported: integral, floating, decimal, date, timestamp)")
      }
      c -> d
    }.toMap
    // the normalization frame: one aggregate, one driver row. NaN is
    // excluded here — Spark's max() sorts NaN above every double, and one
    // NaN row would otherwise stretch the frame to [lo, NaN] and send
    // every row's bucket to garbage; NaN rows themselves are routed to
    // the top bucket below.
    val aggs = cols.flatMap { c =>
      val d = when(isnan(asDouble(c)), lit(null)).otherwise(asDouble(c))
      Seq(min(d).as(s"lo_$c"), max(d).as(s"hi_$c")) }
    val frame = df.agg(aggs.head, aggs.tail: _*).head()
    val nb = 1L << bits
    val buckets = cols.map { c =>
      val (lo, hi) =
        if (frame.isNullAt(frame.fieldIndex(s"lo_$c"))) (0.0, 0.0)
        else (frame.getDouble(frame.fieldIndex(s"lo_$c")),
              frame.getDouble(frame.fieldIndex(s"hi_$c")))
      val d = asDouble(c)
      val bucket =
        if (hi <= lo) lit(0L)
        else least(lit(nb - 1L), greatest(lit(0L),
          floor((d - lit(lo)) / lit(hi - lo) * lit(nb.toDouble))))
      // nulls cluster at 0, NaN at the top — both deterministic corners
      val safe = when(d.isNull, lit(0L))
        .when(d.isNaN, lit(nb - 1L))
        .otherwise(bucket)
      safe
    }
    // 2 columns: the magic-number spread kernel (O(log bits) bit ops);
    // >2: the generic per-bit placement at positions j * |cols| + i
    val z =
      if (cols.size == 2 && bits <= 16) Layout.zValue2(buckets(0), buckets(1))
      else buckets.zipWithIndex.map { case (bucket, i) =>
        (0 until bits).map { j =>
          shiftleft(shiftright(bucket, j).bitwiseAND(lit(1L)),
            j * cols.size + i)
        }.reduce((a, b) => a.bitwiseOR(b))
      }.reduce((a, b) => a.bitwiseOR(b))
    z.as(s"z_${cols.mkString("_")}")
  }

  /** `df` re-laid-out in z-order, ready to write: range-repartitioned on
    * (`prefix` ++ z) into `numPartitions` tasks and sorted the same way
    * in-task, so consecutive files carry disjoint z-ranges (and, through
    * the interleave, narrow ranges on every z-column). `prefix` is for
    * writers that `partitionBy` directory columns: range-partitioning on
    * the prefix first keeps each task inside few directory partitions
    * instead of spraying every task across all of them. */
  def layout(df: DataFrame, zCols: Seq[String], numPartitions: Int,
      bits: Int = 12, prefix: Seq[String] = Nil): DataFrame = {
    val zc = "__graft_z"
    val keys = prefix.map(col) :+ col(zc)
    df.withColumn(zc, zvalue(df, zCols, bits))
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop(zc)
  }
}
