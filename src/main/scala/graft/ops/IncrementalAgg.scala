package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact incremental maintenance of per-group SUM/COUNT aggregates from a
  * keyed-merge change feed ([[graft.sink.KeyedLakeTable.upsertChanges]]) —
  * materialized-view maintenance without rescanning the base table.
  *
  * Why retractions: under latest-wins CDC an "update" is not additive — the
  * replaced version's contribution must LEAVE the aggregate, and a version
  * can even move a key BETWEEN groups (the grouping attribute changed). The
  * change feed carries both images, so each update unfolds into a signed
  * pair (−old, +new) and each insert into (+new); group-summing the signed
  * stream yields the exact delta for every affected group. (SUM/COUNT
  * only: MIN/MAX needs the runner-up on retraction — [[ExtremaState]]'s
  * bounded top-k state — and COUNT(DISTINCT) a mergeable sketch —
  * [[SketchState]].)
  *
  * Scale shape: cost per batch is O(changes) — one narrow explode of the
  * batch-sized feed, one shuffle on the (few) affected groups, and one
  * full-outer merge against the STATE table, which is aggregate-sized (one
  * row per group), not base-table-sized. The base table is never read. Sums
  * are carried as DECIMAL so repeated add/retract cycles stay bit-exact
  * against a from-scratch recompute — doubles would drift ulps per batch.
  */
object IncrementalAgg {

  /** Signed image stream of a change feed: a LIVE new image joins (+1),
    * a live replaced image leaves (−1); noops contribute nothing. With a
    * soft-delete table ([[graft.sink.LakeTableSpec.softDeleteCol]]) pass
    * the flag's field name: tombstone images are then not live — a
    * `delete` retracts only the replaced live row (its tombstone adds
    * nothing), and a later resurrection adds only the new live row (the
    * tombstone it replaces was never counted). Per-key transitions
    * telescope either way, so the folded state always equals a
    * from-scratch aggregate of the live table. */
  def retractions(changes: DataFrame,
      softDeleteField: Option[String] = None): DataFrame = {
    def live(img: Column): Column = softDeleteField match {
      case None    => img.isNotNull
      case Some(f) =>
        img.isNotNull && !coalesce(img.getField(f), lit(false))
    }
    val plus = changes
      .filter(col("change_type").isin("insert", "update", "delete") &&
        live(col("new_image")))
      .select(lit(1L).as("__sign"), col("new_image").as("__img"))
    val minus = changes
      .filter(col("change_type").isin("update", "delete") &&
        live(col("old_image")))
      .select(lit(-1L).as("__sign"), col("old_image").as("__img"))
    plus.unionByName(minus)
  }

  /** Advance `state` — schema `(group, n_rows long, total decimal(22,2))`,
    * possibly empty — by one change-feed batch. `groupField`/`sumField`
    * name fields inside the feed's images. Groups whose row count reaches
    * zero leave the state (their keys were updated away to other groups).
    *
    * The returned frame is small (one row per live group) but accretes one
    * join of lineage per batch — callers looping over many batches should
    * checkpoint it periodically, exactly like any incrementally-built
    * frame. */
  def applyDelta(state: DataFrame, changes: DataFrame, groupField: String,
      sumField: String, softDeleteField: Option[String] = None): DataFrame = {
    val group = col("__img").getField(groupField).as("group")
    val measure = col("__img").getField(sumField).cast("decimal(20,2)")
    val delta = retractions(changes, softDeleteField)
      .select(group, (measure * col("__sign")).as("__m"), col("__sign"))
      .groupBy(col("group"))
      .agg(sum(col("__m")).cast("decimal(22,2)").as("d_total"),
        sum(col("__sign")).as("d_n"))
    // Null-safe join key: the grouping field is nullable in the images, and
    // a plain equi-join would never match NULL to itself — the null group
    // would accumulate a fresh state row every batch instead of merging.
    state.as("s").join(delta.as("d"),
        col("s.group") <=> col("d.group"), "full_outer")
      .select(coalesce(col("d.group"), col("s.group")).as("group"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("total"), lit(0).cast("decimal(22,2)")) +
          coalesce(col("d_total"), lit(0).cast("decimal(22,2)")))
          .cast("decimal(22,2)").as("total"))
      .filter(col("n_rows") > 0)
  }

  /** An empty state frame with the contract schema, for bootstrap. */
  def emptyState(spark: org.apache.spark.sql.SparkSession,
      groupType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("group", groupType),
        StructField("n_rows", LongType),
        StructField("total", DecimalType(22, 2)))))
  }
}
