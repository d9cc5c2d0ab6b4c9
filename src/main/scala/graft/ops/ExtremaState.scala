package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact incremental MIN/MAX maintenance from a keyed-merge change feed —
  * the member of the incremental family that plain signed retraction
  * cannot reach ([[IncrementalAgg]] maintains SUM/COUNT; retracting the
  * CURRENT extremum needs the runner-up, which the aggregate alone no
  * longer knows). The classical exact answer keeps the whole value
  * multiset per group (unbounded state); this operator keeps a BOUNDED
  * buffer per group per side — the k highest (for max) and k lowest (for
  * min) distinct values with multiplicities — plus a truncation
  * WATERMARK that makes staleness DETECTED rather than silent:
  *
  *  - [[applyDelta]]: the batch's signed value stream (+new, −old from
  *    the change feed's both-image updates) merges into each group's
  *    buffer; when a side exceeds k distinct values it truncates back to
  *    k and raises its watermark to the most extreme value dropped. A
  *    retraction of an already-truncated value is discarded — such a
  *    value is bounded by the watermark, so the invariant below survives.
  *  - [[extrema]]: a side's answer is EXACT iff its buffer is non-empty
  *    and its head is ≥ (≤ for min) the watermark — every value ever
  *    dropped is bounded by the watermark, so the head dominates all of
  *    them. A side whose buffer drained below its watermark is
  *    `exhausted`: the true extremum may live in the dropped region, and
  *    the operator says so instead of guessing.
  *  - [[repair]]: rebuilds ONLY the exhausted groups' buffers from the
  *    base table — a group-pruned scan, the documented escape hatch, run
  *    when staleness is detected rather than on every batch.
  *
  * Scale shape: state is ≤ 2k (value, count) pairs per group — plain
  * parquet like [[IncrementalAgg]]'s — and a batch folds in O(changes)
  * plus a per-group window over buffer+batch-distinct values (bounded),
  * never a base-table read. Upsert-heavy feeds that keep displacing the
  * extremum pay an occasional targeted repair; append-mostly feeds never
  * truncate and stay exact forever. NULL measures are ignored, matching
  * SQL MIN/MAX. Values ride as doubles (exact for the integral/decimal
  * measures CDC carries; no accumulation arithmetic ever happens — only
  * comparisons). */
object ExtremaState {

  private val bufType = ArrayType(StructType(Seq(
    StructField("v", DoubleType), StructField("c", LongType))))

  /** Empty state with the contract schema: one row per group, each side's
    * buffer sorted ascending by value, watermarks null until a side first
    * truncates. */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("group", StringType),
        StructField("max_buf", bufType), StructField("max_wm", DoubleType),
        StructField("min_buf", bufType), StructField("min_wm", DoubleType))))

  /** One side's merge: state buffer rows ∪ signed batch deltas →
    * per-(group, value) counts → keep the k most extreme, fold the rest
    * into the watermark. `desc = true` keeps the highest (the max side). */
  private def mergeSide(buf: DataFrame, wm: DataFrame, delta: DataFrame,
      k: Int, desc: Boolean): DataFrame = {
    val merged = buf.unionByName(delta)
      .groupBy(col("group"), col("v")).agg(sum(col("c")).as("c"))
      // c = 0: fully retracted. c < 0: a retraction for a value that was
      // truncated earlier — it lives in the watermark-bounded region, so
      // dropping the row keeps the bound valid (just no longer tight).
      .filter(col("c") > 0)
    val w = Window.partitionBy(col("group"))
      .orderBy(if (desc) col("v").desc else col("v").asc)
    val ranked = merged.withColumn("__rn", row_number().over(w))
    val kept = ranked.filter(col("__rn") <= k)
      .groupBy(col("group"))
      .agg(sort_array(collect_list(struct(col("v"), col("c")))).as("buf"))
    val droppedWm = ranked.filter(col("__rn") > k)
      .groupBy(col("group"))
      .agg((if (desc) max(col("v")) else min(col("v"))).as("new_wm"))
    val mergeWm =
      if (desc) (a: Column, b: Column) => greatest(a, b)
      else (a: Column, b: Column) => least(a, b)
    kept.as("k")
      .join(wm.as("w"), col("k.group") <=> col("w.group"), "full_outer")
      .join(droppedWm.as("d"),
        coalesce(col("k.group"), col("w.group")) <=> col("d.group"),
        "left_outer")
      .select(
        coalesce(col("k.group"), col("w.group")).as("group"),
        coalesce(col("buf"), array().cast(bufType)).as("buf"),
        coalesce(mergeWm(col("wm"), col("new_wm")), col("wm"), col("new_wm"))
          .as("wm"))
  }

  /** Cast a measure to double for the buffer, RAISING when the cast is
    * lossy: a BIGINT/DECIMAL beyond 2^53 significand collapses with its
    * neighbors in double space, so two distinct extrema could compare
    * equal and the operator would report a wrong answer while still
    * claiming `exact = true`. The round-trip check (`double` back to the
    * native type) is exact-iff-representable, costs one codegen'd
    * cast+compare per row, and only arms for the types that can lose
    * (long, decimal) — int/float/double pass through untouched. */
  private def asDoubleExact(raw: Column, t: DataType, ctx: String): Column =
    t match {
      case LongType | _: DecimalType =>
        val d = raw.cast("double")
        when(raw.isNotNull && !(d.cast(t) <=> raw),
          raise_error(concat(lit(s"ExtremaState($ctx): measure value "),
            raw.cast("string"),
            lit(" does not fit a double exactly (beyond 2^53 significand)" +
              " — comparisons over collapsed doubles can report a wrong" +
              " extremum; rescale the measure or keep it within 15" +
              " significant digits"))))
          .otherwise(d)
      case _ => raw.cast("double")
    }

  /** Advance the state by one change-feed batch
    * ([[graft.sink.KeyedLakeTable.upsertChanges]] schema). `groupField` /
    * `valueField` name fields inside the feed's images; the group rides
    * as its string form (null-safe). Like [[IncrementalAgg.applyDelta]],
    * the result accretes plan lineage per batch — checkpoint it when
    * looping. */
  def applyDelta(state: DataFrame, changes: DataFrame, groupField: String,
      valueField: String, k: Int,
      softDeleteField: Option[String] = None): DataFrame = {
    require(k >= 1, s"extrema buffer capacity must be >= 1, got $k")
    val retr = IncrementalAgg.retractions(changes, softDeleteField)
    val vType = retr.schema("__img").dataType match {
      case s: StructType => s(valueField).dataType
      case other => throw new IllegalArgumentException(
        s"ExtremaState: change feed images are $other, expected a struct")
    }
    val delta = retr
      .select(col("__img").getField(groupField).cast("string").as("group"),
        asDoubleExact(col("__img").getField(valueField), vType, "applyDelta")
          .as("v"),
        col("__sign").as("c"))
      .filter(col("v").isNotNull) // SQL MIN/MAX ignore null measures
      .groupBy(col("group"), col("v")).agg(sum(col("c")).as("c"))
      .filter(col("c") =!= 0)
    val maxSide = mergeSide(
      state.select(col("group"), explode(col("max_buf")).as("e"))
        .select(col("group"), col("e.v").as("v"), col("e.c").as("c")),
      state.select(col("group"), col("max_wm").as("wm")),
      delta, k, desc = true)
    val minSide = mergeSide(
      state.select(col("group"), explode(col("min_buf")).as("e"))
        .select(col("group"), col("e.v").as("v"), col("e.c").as("c")),
      state.select(col("group"), col("min_wm").as("wm")),
      delta, k, desc = false)
    maxSide.as("mx").join(minSide.as("mn"),
        col("mx.group") <=> col("mn.group"), "full_outer")
      .select(coalesce(col("mx.group"), col("mn.group")).as("group"),
        col("mx.buf").as("max_buf"), col("mx.wm").as("max_wm"),
        col("mn.buf").as("min_buf"), col("mn.wm").as("min_wm"))
      // a group with both buffers empty and no watermarks has no live
      // values at all (fully retracted, never truncated): drop it
      .filter(size(coalesce(col("max_buf"),
          array().cast(bufType))) > 0 ||
        col("max_wm").isNotNull || col("min_wm").isNotNull)
  }

  /** Read side: per-group `(max_v, max_exact, min_v, min_exact)`. A side
    * is exact when its buffer head dominates everything ever truncated
    * (head ≥ watermark for max, ≤ for min; a never-truncated side is
    * always exact). `exact = false` means the true extremum may lie in
    * the truncated region — run [[repair]] for those groups. */
  def extrema(state: DataFrame): DataFrame = {
    val maxHead = element_at(col("max_buf"), -1).getField("v")
    val minHead = element_at(col("min_buf"), 1).getField("v")
    state.select(col("group"),
      maxHead.as("max_v"),
      (size(col("max_buf")) > 0 &&
        (col("max_wm").isNull || maxHead >= col("max_wm")))
        .as("max_exact"),
      minHead.as("min_v"),
      (size(col("min_buf")) > 0 &&
        (col("min_wm").isNull || minHead <= col("min_wm")))
        .as("min_exact"))
  }

  /** Rebuild the EXHAUSTED groups' state from the base table: a
    * group-pruned scan of only those groups (the detected-staleness
    * escape hatch). Returns the full state with repaired rows swapped
    * in; repaired sides are freshly truncated (watermark reset to the
    * (k+1)-th value, or null when the group fits). All joins are
    * null-safe: a null group is a legitimate group (applyDelta and
    * extrema already treat it as one), so a stale null group is rebuilt
    * like any other instead of silently staying flagged.
    *
    * Large-group guard: the per-group ranking window sorts a flagged
    * group's full distinct-value set in one task. For groups whose
    * distinct count exceeds `distinctCap`, an approximate per-group
    * quantile threshold (percentile_approx at accuracy 10⁴) pre-filters
    * each side to its extreme tail BEFORE the window. The keep-fraction
    * `2/accuracy + (k+1)/distinctCap` guarantees ≥ k+1 surviving distinct
    * values per guarded side (rank error of percentile_approx is
    * ≤ n/accuracy), so the kept set always contains the true top-k AND
    * the (k+1)-th value the watermark needs — output is identical to the
    * unguarded path (spec-pinned with a forced-low cap). Guarded sorts
    * are O(k + n/accuracy) rows per group instead of O(n). */
  def repair(state: DataFrame, base: DataFrame, groupCol: Column,
      valueCol: Column, k: Int,
      distinctCap: Long = 4L * 1000 * 1000): DataFrame = {
    require(distinctCap >= 10L * (k + 1),
      s"distinctCap $distinctCap must be >= 10*(k+1) = ${10L * (k + 1)} " +
        "so the quantile pre-filter's keep-fraction stays well under 1")
    val vType = base.select(valueCol).schema.head.dataType
    val flagged = extrema(state)
      .filter(!col("max_exact") || !col("min_exact"))
      .select(col("group"))
    val values = base
      .select(groupCol.cast("string").as("group"),
        asDoubleExact(valueCol, vType, "repair").as("v"))
      .as("b")
      // unhinted: flagged is batch-bounded (exhausted groups only), but a
      // pathological delete batch can flag millions of groups — degrade to
      // a shuffle semi-join instead of OOMing the driver (AQE broadcasts
      // while it fits)
      .join(flagged.as("f"),
        col("b.group") <=> col("f.group"), "left_semi")
      .filter(col("v").isNotNull)
      .groupBy(col("group"), col("v")).agg(count(lit(1)).as("c"))
    val accuracy = 10000
    val keepFrac = 2.0 / accuracy + (k + 1).toDouble / distinctCap
    val stats = values.groupBy(col("group")).agg(
      count(lit(1)).as("__n"),
      percentile_approx(col("v"), lit(1.0 - keepFrac), lit(accuracy))
        .as("__hi"),
      percentile_approx(col("v"), lit(keepFrac), lit(accuracy)).as("__lo"))
    val guarded = values.as("v")
      .join(stats.as("t"), col("v.group") <=> col("t.group"))
      .select(col("v.group").as("group"), col("v.v").as("v"),
        col("v.c").as("c"), col("__n"), col("__hi"), col("__lo"))
    def side(desc: Boolean) = {
      val pre = guarded.filter(col("__n") <= distinctCap ||
        (if (desc) col("v") >= col("__hi") else col("v") <= col("__lo")))
      val w = Window.partitionBy(col("group"))
        .orderBy(if (desc) col("v").desc else col("v").asc)
      val ranked = pre.select(col("group"), col("v"), col("c"))
        .withColumn("__rn", row_number().over(w))
      ranked.filter(col("__rn") <= k)
        .groupBy(col("group"))
        .agg(sort_array(collect_list(struct(col("v"), col("c")))).as("buf"))
        .as("a")
        .join(ranked.filter(col("__rn") > k).groupBy(col("group"))
            .agg((if (desc) max(col("v")) else min(col("v"))).as("wm"))
            .as("d"),
          col("a.group") <=> col("d.group"), "left_outer")
        .select(col("a.group").as("group"), col("buf"), col("wm"))
    }
    val rebuilt = side(desc = true).as("mx")
      .join(side(desc = false).as("mn"),
        col("mx.group") <=> col("mn.group"), "full_outer")
      .select(coalesce(col("mx.group"), col("mn.group")).as("group"),
        col("mx.buf").as("max_buf"), col("mx.wm").as("max_wm"),
        col("mn.buf").as("min_buf"), col("mn.wm").as("min_wm"))
    state.as("s").join(flagged.as("f2"),
        col("s.group") <=> col("f2.group"), "left_anti")
      .unionByName(rebuilt)
  }
}
