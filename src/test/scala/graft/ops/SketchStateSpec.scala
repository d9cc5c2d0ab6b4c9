package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Mergeable HLL distinct-count state: batching-invariant union-merge
  * (any split count, any order — in dense mode too), sparse-mode
  * exactness at small cardinality (where merged == one-shot also holds),
  * parquet round-trip of the binary state. */
class SketchStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def stream(n: Int) =
    (0 until n).map(i => (s"g${i % 3}", (i % 97).toLong)).toDF("g", "v")

  test("incremental merge == one-shot sketch, for any split and order " +
    "(sparse mode: both estimators are exact here)") {
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

  test("dense mode: the merged estimate is batching-invariant (split " +
    "count, order, associativity) and within the error bound — but need " +
    "not equal the one-shot HIP estimate") {
    // ~30k distinct values per group: far past the sparse threshold
    val df = (0 until 100000).map(i => (s"g${i % 3}", i.toLong))
      .toDF("g", "v")
    def est(states: Seq[org.apache.spark.sql.DataFrame]) =
      SketchState.estimate(SketchState.merge(states))
        .as[(String, Long)].collect().toMap
    def split(n: Int) = (0 until n).map(i =>
      SketchState.batchState(df.filter(pmod(col("v"), lit(n)) === i),
        "g", col("v")))
    val s3 = split(3)
    val base = est(s3)
    assert(est(s3.reverse) == base, "order changed the estimate")
    assert(est(split(7)) == base, "split count changed the estimate")
    assert(est(Seq(SketchState.merge(Seq(s3(0), s3(1)))) ++ Seq(s3(2)))
      == base, "associativity changed the estimate")
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    base.foreach { case (g, n) =>
      assert(math.abs(n - exact(g)) <= exact(g) * 0.05,
        s"group $g merged estimate $n vs exact ${exact(g)}")
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
