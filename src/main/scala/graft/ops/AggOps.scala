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
    val finest = df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as(countName), sum(sumExpr).as(sumName))
      .localCheckpoint(true)
    def level(k: Int): DataFrame = {
      // keep the first k dims, null out the rest (rollup semantics)
      val agg =
        if (k == dims.length) finest
        else finest.groupBy(dims.take(k).map(col): _*)
          .agg(sum(col(countName)).as(countName), sum(col(sumName)).as(sumName))
      val withNulls = dims.drop(k).foldLeft(agg) { (d, c) =>
        d.withColumn(c, lit(null).cast(finest.schema(c).dataType))
      }
      withNulls.select(
        dims.map(col) :+
          col(countName).cast("long").as(countName) :+
          col(sumName).cast("double").as(sumName): _*)
    }
    (dims.length to 0 by -1).map(level).reduce(_ unionByName _)
  }
}
