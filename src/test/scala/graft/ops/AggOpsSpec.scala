package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[AggOps.rollupReagg]] must be output-indistinguishable from native
  * `rollup` — including on data that contains NULL dimension values — while
  * scanning the fact stream once instead of once per grouping level. */
class AggOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("rollupReagg equals native rollup, including null dimension values") {
    val df = Seq(
      (Some("a"), Some("x"), 1), (Some("a"), Some("y"), 2),
      (Some("a"), None, 4), (None, Some("x"), 8),
      (Some("b"), Some("x"), 16), (Some("b"), Some("x"), 32),
      (None, None, 64))
      .toDF("d1", "d2", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val native = df.rollup(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("double").as("s"))
    val reagg = AggOps.rollupReagg(df, Seq("d1", "d2"), col("v"), "n", "s")
    assert(native.exceptAll(reagg).isEmpty && reagg.exceptAll(native).isEmpty,
      s"native:\n${native.orderBy("d1", "d2").collect().mkString("\n")}\n" +
        s"reagg:\n${reagg.orderBy("d1", "d2").collect().mkString("\n")}")
    // nullability differs (sum-of-counts is nullable, count is not) but
    // names and types must agree exactly
    assert(reagg.schema.map(f => (f.name, f.dataType)) ===
      native.schema.map(f => (f.name, f.dataType)))
  }

  test("cubeReagg equals native cube, including null dimension values") {
    val df = Seq(
      (Some("a"), Some("x"), 1), (Some("a"), Some("y"), 2),
      (Some("a"), None, 4), (None, Some("x"), 8),
      (Some("b"), Some("x"), 16), (Some("b"), Some("x"), 32),
      (None, None, 64))
      .toDF("d1", "d2", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val native = df.cube(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("double").as("s"))
    val reagg = AggOps.cubeReagg(df, Seq("d1", "d2"), col("v"), "n", "s")
    assert(native.exceptAll(reagg).isEmpty && reagg.exceptAll(native).isEmpty)
  }

  test("empty input yields zero rows, matching native rollup/cube") {
    val df = Seq(("a", "x", 1)).toDF("d1", "d2", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
      .filter(col("v") < 0)
    assert(df.rollup(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s")).count() === 0L)
    assert(AggOps.rollupReagg(df, Seq("d1", "d2"), col("v"), "n", "s")
      .count() === 0L)
    assert(AggOps.cubeReagg(df, Seq("d1", "d2"), col("v"), "n", "s")
      .count() === 0L)
  }

  test("rollupReagg plans a single pass: no Expand over the fact stream") {
    val df = (0 until 1000).map(i => (s"k${i % 3}", s"g${i % 5}", i))
      .toDF("d1", "d2", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val nativePlan = df.rollup(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .queryExecution.executedPlan.toString
    assert(nativePlan.contains("Expand"), "native rollup should Expand (the baseline)")
    val reaggPlan = AggOps.rollupReagg(df, Seq("d1", "d2"), col("v"), "n", "s")
      .queryExecution.executedPlan.toString
    assert(!reaggPlan.contains("Expand"), s"reagg must not Expand:\n$reaggPlan")
  }
}
