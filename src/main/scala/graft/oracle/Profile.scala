package graft.oracle

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: one stats row per column (null counts, exact distinct
  * cardinality, min/max) — the data-quality gate a corpus passes before
  * training, and the freshness check a replicated lake table gets after
  * each merge.
  *
  * [[table]] is the exact form: one aggregate pass per column (union of
  * tiny 1-row frames), fully SQL-oracle-able. [[tableApprox]] is the
  * 100 TB form: ONE pass over the table computing every column's stats
  * together, with `approx_count_distinct` in place of exact distincts —
  * no per-column rescans, no count_distinct Expand blow-up; the suite
  * bounds its error against the exact profiler. */
object Profile {

  /** Exact per-column profile. Column order of the output follows the
    * schema; values are stringified for a uniform shape. */
  def table(df: DataFrame): DataFrame =
    df.schema.fields.map { f =>
      val c = col(f.name)
      df.agg(
        count(lit(1)).as("n_rows"),
        count(c).as("n_nonnull"),
        count_distinct(c).as("n_distinct"),
        min(c).cast("string").as("min_val"),
        max(c).cast("string").as("max_val"))
        .select(
          lit(f.name).as("column_name"),
          lit(f.dataType.simpleString).as("dtype"),
          col("n_rows"), col("n_nonnull"), col("n_distinct"),
          col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)

  /** Single-pass profile with approximate distincts (relative error ~
    * `rsd`): every column's aggregates ride in ONE partial-agg scan whose
    * single result row is collected (bounded driver traffic by
    * construction) and pivoted locally — guaranteeing the table really is
    * read once, where a union of per-column projections would let the
    * planner re-evaluate the aggregate per branch. */
  def tableApprox(df: DataFrame, rsd: Double = 0.02): DataFrame = {
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"__nn_${f.name}"),
        approx_count_distinct(c, rsd).as(s"__nd_${f.name}"),
        min(c).cast("string").as(s"__mn_${f.name}"),
        max(c).cast("string").as(s"__mx_${f.name}"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*).collect().head
    val rows = df.schema.fields.map { f =>
      (f.name, f.dataType.simpleString, one.getAs[Long]("__n"),
        one.getAs[Long](s"__nn_${f.name}"), one.getAs[Long](s"__nd_${f.name}"),
        Option(one.getAs[String](s"__mn_${f.name}")).orNull,
        Option(one.getAs[String](s"__mx_${f.name}")).orNull)
    }.toSeq
    val s = df.sparkSession
    import s.implicits._
    rows.toDF("column_name", "dtype", "n_rows", "n_nonnull",
      "n_distinct_approx", "min_val", "max_val")
  }
}
