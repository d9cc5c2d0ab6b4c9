package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Profile

/** Table profiling: exact stats correctness and the one-pass approximate
  * profiler's error bound + plan shape. */
class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(1.5)), (2L, Some("b"), Some(2.5)),
    (3L, Some("a"), None), (4L, None, Some(-0.5)), (5L, Some("c"), Some(1.5)))
    .toDF("id", "s", "v")

  test("exact profile reports nulls, distincts, min/max per column") {
    val got = Profile.table(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getString(6)))).toMap
    assert(got("id") === ((5L, 5L, 5L, "1", "5")))
    assert(got("s") === ((5L, 4L, 3L, "a", "c")))
    assert(got("v") === ((5L, 4L, 3L, "-0.5", "2.5")))
  }

  test("one-pass approx profile matches exact within the sketch bound") {
    val big = spark.range(20000).select(col("id"),
      (col("id") % 997).as("k"), (col("id") % 7).cast("string").as("s"))
    val exact = Profile.table(big).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = Profile.tableApprox(big, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    exact.foreach { case (c, n) =>
      val a = approx(c)
      assert(math.abs(a - n).toDouble / n <= 0.1, s"col $c: exact=$n approx=$a")
    }
  }

  test("approx profile keeps null-sensitive min/max and nonnull counts exact") {
    val got = Profile.tableApprox(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getString(5), r.getString(6)))).toMap
    assert(got("s") === ((4L, "a", "c")))
    assert(got("v") === ((4L, "-0.5", "2.5")))
  }
}
