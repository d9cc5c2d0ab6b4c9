package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-based corpus selection: keep the best p-fraction of each
  * stratum (language, source) under a caller-defined ordering — the
  * "filter to the top quartile per language" stage of corpus curation.
  *
  * Two paths with one semantic:
  *  - [[topPExact]] ranks inside each stratum with a partitioned window.
  *    Exact (deterministic given a total-order tie-break) and fully
  *    SQL-oracle-able, but each stratum sorts on one task chain — right
  *    for many-strata corpora, wrong at few-strata × 100 TB.
  *  - [[topPByThreshold]] is the scale path: one small agg learns an
  *    approximate per-stratum score threshold, broadcast back as a
  *    map-side filter — no per-stratum sort of the corpus, the stream
  *    never shuffles. Selection size is approximate near the boundary
  *    (sketch error), which curation tolerates; the suite pins it against
  *    the exact path.
  */
object Select {

  /** Keep rows with rank ≤ ceil(p·|stratum|) under `order` within each
    * stratum. `order` must total-order rows (include a unique tie-break
    * column) for a deterministic result. */
  def topPExact(df: DataFrame, stratumCol: String, order: Seq[Column],
      p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"topPExact: p must be in (0,1], got $p")
    val rank = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(rank))
      .withColumn("__cnt", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(lit(p) * col("__cnt")))
      .drop("__rn", "__cnt")
  }

  /** Keep rows scoring at or above each stratum's approximate (1-p)
    * quantile. `accuracy` is `percentile_approx`'s knob (1/accuracy
    * relative rank error). */
  def topPByThreshold(df: DataFrame, stratumCol: String, scoreCol: Column,
      p: Double, accuracy: Int = 10000): DataFrame = {
    require(p > 0 && p <= 1, s"topPByThreshold: p must be in (0,1], got $p")
    val thr = df.groupBy(col(stratumCol).as("__stratum"))
      .agg(percentile_approx(scoreCol, lit(1 - p), lit(accuracy)).as("__thr"))
    df.join(broadcast(thr), col(stratumCol) === col("__stratum"))
      .filter(scoreCol >= col("__thr"))
      .drop("__stratum", "__thr")
  }
}
