package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable per-group QUANTILE state — the percentile member of the
  * incremental-maintenance family ([[IncrementalAgg]] SUM/COUNT,
  * [[SketchState]] DISTINCT, [[ExtremaState]] MIN/MAX). Quantiles over a
  * CDC-maintained lake otherwise rescan history on every read (q106 is the
  * batch spelling); this keeps a bounded sketch per group and folds each
  * change-feed batch in O(changes).
  *
  * The sketch is the DDSketch design (Masson, Rim, Lee, *DDSketch: a fast
  * and fully-mergeable quantile sketch with relative-error guarantees*,
  * VLDB 2019): fixed relative accuracy α, log-spaced buckets with base
  * γ = (1+α)/(1−α) — a value v lands in bucket ⌈log_γ |v|⌉ of its sign's
  * region, and the bucket's representative 2γ^i/(γ+1) is within α·|x| of
  * EVERY x the bucket covers. Chosen over KLL/t-digest for exactly the
  * properties CDC maintenance needs, which those lack:
  *
  *  - state is pure (region, bucket) → count rows, so MERGE IS COUNT
  *    ADDITION: associative, commutative, deterministic — the folded
  *    state is EXACTLY batching-invariant (any split of the feed into any
  *    number of batches yields the identical state, not merely one within
  *    error bounds; q138 pins 3-way vs 5-way equality). KLL compaction is
  *    randomized and order-dependent.
  *  - counts SUBTRACT: the change feed's signed retraction stream
  *    (−old, +new per update) folds in directly, so updates and deletes
  *    maintain the sketch exactly — per-key retraction streams telescope
  *    to the final image, so the state equals a from-scratch build of the
  *    latest-wins table. No merge-tree sketch supports deletion at all.
  *
  * The trade: the error guarantee is RELATIVE ON THE VALUE (α of |x| at
  * the queried rank — the rank itself is exact), and bucket count grows
  * with the value range's log: doubles span ≤ ~⌈709/ln γ⌉ buckets per
  * sign (~35k at α = 1%), in practice a few hundred for any physical
  * measure. State is plain parquet like the family's other members.
  *
  * Scale shape: a batch fold shuffles O(groups × touched buckets) count
  * rows; the read side's per-group window is bounded by the bucket count
  * (never the row count); the base table is never rescanned. Values ride
  * as doubles — safe here without [[ExtremaState]]'s exactness guard
  * because a double cast moves a value by ≤ half an ulp, far inside the
  * α-wide bucket (the sketch's own error dominates). NULL measures are
  * ignored, matching SQL percentile semantics. */
object QuantileState {

  /** Default relative accuracy: 1% of the value at the queried rank. */
  val DefaultAlpha: Double = 0.01

  private def gammaOf(alpha: Double): Double = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    (1.0 + alpha) / (1.0 - alpha)
  }

  /** Empty state with the contract schema: one row per live
    * (group, region, bucket); `region` is the value's sign (−1, 0, 1),
    * `bucket` is ⌈log_γ |v|⌉ (0 in the zero region), `c` the signed count
    * (always > 0 in a consistent state — counts that cancel to zero leave
    * the state). */
  def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("group", StringType),
        StructField("region", IntegerType),
        StructField("bucket", IntegerType),
        StructField("c", LongType))))

  private def regionOf(v: Column): Column =
    when(v > 0, 1).when(v < 0, -1).otherwise(0)

  private def bucketOf(v: Column, gamma: Double): Column =
    when(v === 0, 0)
      .otherwise(ceil(log(abs(v)) / lit(math.log(gamma))).cast("int"))

  /** One batch's per-group sketch directly from a table (the rescan /
    * bootstrap spelling; the incremental path is [[applyDelta]]). */
  def batchState(df: DataFrame, groupCol: Column, valueCol: Column,
      alpha: Double = DefaultAlpha): DataFrame = {
    val g = gammaOf(alpha)
    df.filter(valueCol.isNotNull)
      .select(groupCol.cast("string").as("group"),
        valueCol.cast("double").as("__v"))
      .groupBy(col("group"), regionOf(col("__v")).as("region"),
        bucketOf(col("__v"), g).as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Fold any number of states into one: count addition per
    * (group, region, bucket) — associative, commutative, deterministic,
    * hence exactly batching-invariant. All inputs must share one α (the
    * bucket base); mixing bases silently mis-buckets, so keep α a
    * pipeline constant like [[SketchState]]'s lgK. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "QuantileState.merge: no states")
    states.reduce(_ unionByName _)
      .groupBy(col("group"), col("region"), col("bucket"))
      .agg(sum(col("c")).as("c"))
      .filter(col("c") =!= 0)
  }

  /** Advance the state by one change-feed batch
    * ([[graft.sink.KeyedLakeTable.upsertChanges]] schema): the signed
    * image stream (+new, −old) bucketizes and count-sums into the state.
    * Retracting a value cancels exactly the count its insert added, so
    * after any prefix of a consistent feed the state equals
    * [[batchState]] over the latest-wins table at that point. The result
    * accretes plan lineage per batch — checkpoint it when looping. */
  def applyDelta(state: DataFrame, changes: DataFrame, groupField: String,
      valueField: String, alpha: Double = DefaultAlpha,
      softDeleteField: Option[String] = None): DataFrame = {
    val g = gammaOf(alpha)
    val v = col("__img").getField(valueField).cast("double")
    val delta = IncrementalAgg.retractions(changes, softDeleteField)
      .filter(v.isNotNull) // SQL percentiles ignore null measures
      .select(col("__img").getField(groupField).cast("string").as("group"),
        regionOf(v).as("region"), bucketOf(v, g).as("bucket"),
        col("__sign").as("c"))
    merge(Seq(state, delta))
  }

  /** Read side: per-group value estimate at each quantile `p` — the
    * representative of the bucket holding the item of exact rank ⌈p·n⌉
    * (`percentile_disc` semantics), guaranteed within α·|x| of that
    * item's true value. One bounded per-group window over the bucket
    * rows (≤ bucket count, never row count). Output:
    * `(group, p, value)`, one row per group per requested quantile. */
  def quantiles(state: DataFrame, ps: Seq[Double],
      alpha: Double = DefaultAlpha): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0,1], got $ps")
    val g = gammaOf(alpha)
    // one sortable key over the three regions: negatives (large |v|
    // first), zero, positives — bucket magnitudes stay far below the
    // region stride
    val key = col("region").cast("long") * 4000000000L +
      when(col("region") === -1, -col("bucket")).otherwise(col("bucket"))
        .cast("long")
    val wOrd = Window.partitionBy(col("group")).orderBy(key)
    val wAll = Window.partitionBy(col("group"))
    val est = when(col("region") === 0, lit(0.0))
      .otherwise(col("region") * pow(lit(g), col("bucket")) *
        lit(2.0) / lit(g + 1.0))
    state
      .withColumn("__cum", sum(col("c")).over(wOrd))
      .withColumn("__n", sum(col("c")).over(wAll))
      .withColumn("p", explode(typedlit(ps)))
      // the bucket holding rank ⌈p·n⌉: cumulative count crosses the target
      .withColumn("__target", greatest(ceil(col("p") * col("__n")), lit(1L)))
      .filter(col("__cum") >= col("__target") &&
        (col("__cum") - col("c")) < col("__target"))
      .select(col("group"), col("p"), est.as("value"))
  }
}
