package graft.sim

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise mean of an `Array[Float]` embedding column — the centroid
  * aggregate of clustering / IVF training, as a typed `Aggregator` (the
  * custom-UDAF surface SURVEY §2.9 reserves for the pipeline extensions).
  *
  * Two-phase by construction: `reduce` folds rows into a per-partition
  * (sum, count) buffer, `merge` combines buffers — so Spark executes it as
  * a partial aggregation and the shuffle carries one buffer per partition
  * per group, never the vectors themselves. Accumulation is double-width to
  * keep float rounding out of the running sum.
  */
object VectorMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    var i = 0
    while (i < a.length) { sums(i) += a(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val sums = x._1
    var i = 0
    while (i < sums.length) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.emptyDoubleArray else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  /** Column form: `df.groupBy("label").agg(VectorMean.column(col("embedding")))`. */
  def column(embedding: Column): Column = udaf(VectorMean).apply(embedding)
}
