package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation rewrites that keep a 100 TB fact stream to ONE pass.
  *
  * Spark plans `rollup`/`cube` with an `Expand` node that duplicates every
  * input row once per grouping level, so a d-dimensional rollup pushes
  * (d+1)× the fact stream through the partial aggregate. For decomposable
  * aggregates (count, sum over exact types) that is pure waste: the coarser
  * levels are exact re-aggregations of the finest level, whose cardinality
  * is the number of GROUPS — negligible next to the stream. [[rollupReagg]]
  * scans the stream once and derives every coarser level from the finest
  * result, producing bit-identical output (counts and decimal sums are
  * order-independent; doubles are cast only after the exact sums).
  */
object AggOps {

  /** Rollup over `dims` computed as one finest-level pass plus
    * re-aggregation, equivalent to
    * `df.rollup(dims).agg(count(1) as countName, sum(sumExpr) as sumName)`
    * with both outputs cast to (`long`, `double`) at the end.
    *
    * `sumExpr` must be an exact (integral/decimal) type so partial sums
    * re-aggregate without floating-point order sensitivity — the same
    * contract the DuckDB ROLLUP oracle satisfies. The finest frame is
    * eagerly checkpointed: it is tiny (one row per finest group) and feeds
    * d+1 level projections.
    */
  def rollupReagg(df: DataFrame, dims: Seq[String], sumExpr: Column,
      countName: String, sumName: String): DataFrame = {
    require(dims.nonEmpty, "rollupReagg: need at least one rollup dimension")
    reaggSets(df, dims, (dims.length to 0 by -1).map(dims.take),
      sumExpr, countName, sumName)
  }

  /** [[rollupReagg]] with the sum carried as [[unscaledLong]] fixed-point
    * integers: the one-pass rewrite AND the long fast path compound — the
    * finest pass is a long-accumulator scan, the re-aggregations are long
    * adds over group counts, and the value is rescaled exactly once per
    * output row. Output identical to
    * `rollup(dims).agg(count, sum(decimal).cast(double))` under
    * [[fixedPointSum]]'s per-group bound contract. */
  def rollupReaggFixedPoint(df: DataFrame, dims: Seq[String], valueCol: Column,
      scale: Int, countName: String, sumName: String): DataFrame = {
    require(dims.nonEmpty, "rollupReaggFixedPoint: need at least one dimension")
    var p = java.math.BigDecimal.ONE
    (0 until scale).foreach(_ => p = p.multiply(java.math.BigDecimal.TEN))
    reaggSets(df, dims, (dims.length to 0 by -1).map(dims.take),
      unscaledLong(valueCol, scale), countName, sumName,
      finalizeSum = c => (c.cast("decimal(38,0)") / lit(p)).cast("double"))
  }

  /** Cube over `dims` — all 2^d grouping sets — computed the same way:
    * one finest pass, every subset re-aggregated from the finest groups.
    * Native `cube` Expands the stream 2^d×, so the one-pass gap widens
    * with dimensionality exactly where cubes get expensive. */
  def cubeReagg(df: DataFrame, dims: Seq[String], sumExpr: Column,
      countName: String, sumName: String): DataFrame = {
    require(dims.nonEmpty, "cubeReagg: need at least one cube dimension")
    reaggSets(df, dims,
      (dims.length to 0 by -1).flatMap(k => dims.combinations(k)),
      sumExpr, countName, sumName)
  }

  /** Shared engine: aggregate the finest level once, then derive each
    * grouping set (a subset of `dims` to keep, the rest nulled) from the
    * tiny finest frame. */
  private def reaggSets(df: DataFrame, dims: Seq[String],
      keepSets: Seq[Seq[String]], sumExpr: Column,
      countName: String, sumName: String,
      finalizeSum: Column => Column = _.cast("double")): DataFrame = {
    val finest = df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as(countName), sum(sumExpr).as(sumName))
      .localCheckpoint(true)
    def level(keep: Seq[String]): DataFrame = {
      val agg =
        if (keep.length == dims.length) finest
        else if (keep.nonEmpty)
          finest.groupBy(keep.map(col): _*)
            .agg(sum(col(countName)).as(countName), sum(col(sumName)).as(sumName))
        else
          // grand total: group on a constant instead of a global agg so an
          // EMPTY input yields zero rows, matching native rollup/cube (a
          // global agg would mint one spurious all-NULL row)
          finest.groupBy(lit(1).as("__g"))
            .agg(sum(col(countName)).as(countName), sum(col(sumName)).as(sumName))
            .drop("__g")
      val withNulls = dims.filterNot(keep.contains).foldLeft(agg) { (d, c) =>
        d.withColumn(c, lit(null).cast(finest.schema(c).dataType))
      }
      withNulls.select(
        dims.map(col) :+
          col(countName).cast("long").as(countName) :+
          finalizeSum(col(sumName)).as(sumName): _*)
    }
    keepSets.map(level).reduce(_ unionByName _)
  }

  /** Exact decimal-sum through the integer fast path.
    *
    * Spark's decimal Sum leaves the long-backed representation as soon as
    * the accumulator precision passes 18 (every `sum(decimal)` does: the
    * result type adds 10 digits), and decimal×decimal per-row multiplies
    * allocate BigDecimals — the dominant cost of pricing-style rollups.
    * When the operands have fixed scale, the identical rational value can
    * be computed on UNSCALED longs: sum the integer representations, then
    * rescale ONCE per group through an exact decimal divide before the
    * final double cast. Same value, one codegen'd long add per row.
    *
    * Contract: the per-group unscaled sum must fit a long — callers state
    * the bound (here: |unscaled| ≤ 1.1e11/row allows ~8e7 rows/group of
    * headroom even in the worst case); ANSI mode (Spark 4 default) makes
    * an overflow a loud error, never a silent wrap. */
  def fixedPointSum(unscaled: Column, scale: Int, name: String): Column = {
    require(scale >= 0 && scale <= 18, s"fixedPointSum: bad scale $scale")
    var p = java.math.BigDecimal.ONE
    (0 until scale).foreach(_ => p = p.multiply(java.math.BigDecimal.TEN))
    (sum(unscaled).cast("decimal(38,0)") / lit(p)).cast("double").as(name)
  }

  /** The unscaled-long view of a double column at `scale` decimals. This
    * IS the decimal cast (same conversion, same half-up digit —
    * `round(x·10^s)` on the raw double is NOT: a literal like 1.005 rounds
    * up through the decimal string but down through its binary product
    * 100.49999…), followed by exact integer extraction — fused into the
    * allocation-free [[graft.functions.UnscaledFixed]] kernel
    * (constructed directly — works on a plain session; fuzz-proven
    * bit-identical to the cast-and-multiply form it replaced). ANSI
    * contract: values whose integer part exceeds 18−scale digits throw
    * loudly. */
  def unscaledLong(c: Column, scale: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.UnscaledFixed.build(Seq(
      ColumnBridge.expression(c), ColumnBridge.expression(lit(18)),
      ColumnBridge.expression(lit(scale)))))
  }
}
