package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted source interleaving (stride scheduling): give every document a
  * position such that reading the corpus in position order yields each
  * source at its target rate — the curriculum/mixture-ordering stage of a
  * training pipeline (e.g. 60% web, 30% code, 10% reference, maintained in
  * every prefix, not just in aggregate).
  *
  * The classic stride schedule: the i-th document of source s (1-based,
  * ordered by id) gets position `(i - 0.5) / w_s`. Sorting by position
  * interleaves sources so that any length-k prefix holds source s about
  * `w_s·k` times (off by at most one full stride). Computed with one
  * source-partitioned rank window and a projection — NO global window;
  * the global sort happens only where it belongs, at read/write time,
  * like any ordered output. */
object Interleave {

  /** Add `pos` (the stride-schedule position) to every row. Weights are
    * normalized; sources missing from `weights` fail loudly rather than
    * silently landing at infinity. */
  def byWeight(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "interleave: empty weight map")
    weights.foreach { case (k, v) =>
      require(v > 0, s"interleave: weight for '$k' must be > 0, got $v") }
    val total = weights.values.sum
    val w = typedLit(weights.map { case (k, v) => k -> v / total })
    val rn = row_number().over(
      Window.partitionBy(col(sourceCol)).orderBy(col(idCol)))
    df.withColumn("__w", coalesce(element_at(w, col(sourceCol)),
        raise_error(concat(lit("interleave: source '"), col(sourceCol),
          lit("' has no weight — every source must be in the mixture")))))
      .withColumn("pos", (rn.cast("double") - 0.5) / col("__w"))
      .drop("__w")
  }
}
