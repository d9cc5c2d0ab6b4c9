package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — facts at `ts` against intervals
  * `[start, end)` sharing a key. Spark plans a raw inequality join as a
  * broadcast-nested-loop or cartesian + filter: |facts|×|intervals| per
  * key. This is the bucketized spelling: intervals explode to the coarse
  * time buckets they cover, facts map to their single bucket, and the join
  * becomes an EQUI-join on (key…, bucket) with the exact containment
  * predicate as a residual filter — hash-joinable, AQE-skew-splittable,
  * broadcastable when the interval side is small.
  *
  * Each (fact, interval) pair meets in exactly one bucket (the fact's), so
  * the output has no bucketization duplicates. Cost model: the interval
  * side inflates by ≈ avg(interval length)/bucketWidth + 1 rows — pick the
  * width near the typical interval length so inflation stays ~2× while
  * bucket selectivity does the pruning.
  *
  * Intervals with `end <= start` are empty by the half-open contract and
  * are dropped (also guards Spark's descending `sequence`). */
object RangeJoin {

  def rangeJoin(facts: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val w = lit(bucketWidth)
    val ivb = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b",
        explode(sequence(expr(s"$startCol div $bucketWidth"),
          expr(s"($endCol - 1) div $bucketWidth"))))
    val fb = facts.withColumn("__b", expr(s"$tsCol div $bucketWidth"))
    fb.join(ivb, keyCols :+ "__b")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__b")
  }
}
