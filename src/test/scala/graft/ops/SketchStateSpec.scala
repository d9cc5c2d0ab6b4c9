package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Mergeable HLL distinct-count state: lossless union-merge (incremental
  * == one-shot, any batch split/order), sparse-mode exactness at small
  * cardinality, parquet round-trip of the binary state. */
class SketchStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def stream(n: Int) =
    (0 until n).map(i => (s"g${i % 3}", (i % 97).toLong)).toDF("g", "v")

  test("incremental merge == one-shot sketch, for any split and order") {
    val df = stream(3000)
    val oneShot = SketchState.estimate(SketchState.batchState(df, "g", col("v")))
      .as[(String, Long)].collect().toMap
    for (splits <- Seq(2, 5)) {
      val states = (0 until splits)
        .map(i => SketchState.batchState(
          df.filter(pmod(col("v"), lit(splits)) === i), "g", col("v")))
      val merged = SketchState.estimate(SketchState.merge(states.reverse))
        .as[(String, Long)].collect().toMap
      assert(merged == oneShot, s"splits=$splits drifted")
    }
  }

  test("sparse-mode exactness: estimate == true distinct at this " +
    "cardinality") {
    val df = stream(3000) // 97 distinct values per group pattern
    val est = SketchState.estimate(SketchState.batchState(df, "g", col("v")))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(est == exact)
  }

  test("state is parquet-persistable and resumes cleanly") {
    val df = stream(1000)
    val dir = tmpDir("sketch-state")
    SketchState.batchState(df.filter(col("v") < 50), "g", col("v"))
      .write.mode("overwrite").parquet(s"$dir/state")
    val resumed = spark.read.parquet(s"$dir/state")
    val extra = SketchState.batchState(df.filter(col("v") >= 50), "g", col("v"))
    val merged = SketchState.estimate(SketchState.merge(Seq(resumed, extra)))
      .as[(String, Long)].collect().toMap
    val oneShot = SketchState.estimate(SketchState.batchState(df, "g", col("v")))
      .as[(String, Long)].collect().toMap
    assert(merged == oneShot)
  }

  test("merge of zero states fails loudly") {
    intercept[IllegalArgumentException](SketchState.merge(Nil))
  }
}
