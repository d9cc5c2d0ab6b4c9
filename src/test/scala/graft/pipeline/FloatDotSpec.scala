package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native vec_dot expression must be bit-identical to the composed
  * higher-order form it replaced, including its null semantics. */
class FloatDotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to aggregate(zip_with(...)) on pseudo-random vectors") {
    val rows = (0 until 200).map { i =>
      val a = Array.tabulate(64)(j => ((i * 31 + j * 7) % 97 / 13.0f) - 3.5f)
      val b = Array.tabulate(64)(j => ((i * 17 + j * 11) % 89 / 11.0f) - 4.0f)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      expr("vec_dot(a, b)").as("native"), hofDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
  }

  test("null semantics match the composed form: empty, mismatched, null element") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))), // 11.0
      (2L, Some(Array.empty[Float]), Some(Array.empty[Float])), // 0.0
      (3L, Some(Array(1.0f)), Some(Array(1.0f, 2.0f))), // mismatched -> null
      (4L, None, Some(Array(1.0f)))) // null input -> null
      .toDF("id", "a", "b")
    val got = df.select(col("id"), expr("vec_dot(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map(1L -> Some(11.0), 2L -> Some(0.0), 3L -> None, 4L -> None))
  }

  test("mixed float/double element types work (corpus vectors vs centroid means)") {
    val df = Seq((1L, Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("id", "a", "b")
      .select(col("id"), col("a"), col("b").cast("array<double>"))
    val got = df.select(expr("vec_dot(a, b)")).collect().head.getDouble(0)
    assert(got === 1.0) // 1*0.5 + 2*0.25
  }

  test("stays inside whole-stage codegen (no CodegenFallback seam)") {
    // a parquet round-trip prevents constant folding from collapsing the
    // projection into a LocalTableScan
    val dir = tmpDir("floatdot")
    (0 until 10).map(i => (i.toLong, Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(expr("vec_dot(a, b)"))
    val plan = q.queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators fused into a whole-stage-codegen span
    assert(plan.contains("*(1) Project [vec_dot"),
      s"the vec_dot projection must sit inside a codegen span:\n$plan")
    val generated = q.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(generated.contains("FloatDot.compute"),
      "the generated code must call the fused kernel, not an eval fallback")
  }
}
