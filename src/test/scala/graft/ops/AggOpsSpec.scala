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

  test("fixedPointSum equals the decimal path bit for bit, boundary cases included") {
    // Values whose double forms sit near the .xx5 rounding boundary, plus
    // the product shape of the pricing query (price × (1 - discount)).
    val vals = Seq(0.005, 0.015, 1.005, 2.675, 4.35, 0.07, 123.455,
      99999.99, 0.01, 50.0, 3.33, 7.77)
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v, 0.01 * (i % 11)) }
      .toDF("g", "price", "disc")
    val dec = df.groupBy("g").agg(
      sum(col("price").cast("decimal(12,2)") *
        (lit(1).cast("decimal(6,4)") - col("disc").cast("decimal(6,4)")))
        .cast("double").as("s"))
    val fp = df.groupBy("g").agg(
      AggOps.fixedPointSum(
        AggOps.unscaledLong(col("price"), 2) *
          (lit(10000L) - AggOps.unscaledLong(col("disc"), 4)), 6, "s"))
    val a = dec.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val b = fp.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(a.sameElements(b), s"decimal=${a.mkString(",")} fp=${b.mkString(",")}")
  }

  test("rollupReaggFixedPoint equals native decimal rollup, nulls and boundaries included") {
    val df = Seq(
      (Some("a"), Some("x"), 1.005), (Some("a"), Some("y"), 2.675),
      (Some("a"), None, 4.35), (None, Some("x"), 0.07),
      (Some("b"), Some("x"), 99.99), (Some("b"), Some("x"), 0.01),
      (None, None, 123.455))
      .toDF("d1", "d2", "v")
    val native = df.rollup(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v").cast("decimal(12,2)")).cast("double").as("s"))
    val fp = AggOps.rollupReaggFixedPoint(df, Seq("d1", "d2"), col("v"), 2, "n", "s")
    assert(native.exceptAll(fp).isEmpty && fp.exceptAll(native).isEmpty,
      s"native:\n${native.orderBy("d1", "d2").collect().mkString("\n")}\n" +
        s"fp:\n${fp.orderBy("d1", "d2").collect().mkString("\n")}")
  }

  test("the fixed-point x100 pricing equals the decimal x100 pricing on real data") {
    val sfDir = "/root/testdata/sf0.001"
    val dec = graft.queries.RelationalQueries.q75Scale100Pricing(spark, sfDir).collect()
    val fp = graft.queries.RelationalQueries.q79Scale100FixedPoint(spark, sfDir).collect()
    assert(dec.length === fp.length && dec.nonEmpty)
    dec.zip(fp).foreach { case (d, f) => assert(d === f) }
  }
}
