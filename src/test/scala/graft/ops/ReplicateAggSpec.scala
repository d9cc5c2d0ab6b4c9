package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ReplicateAgg.partials]] finished with a plain groupBy must be
  * output-indistinguishable from the explode-based spelling it strength-
  * reduces — including on NULL group values, NULL measures, and
  * array-typed (binary) group columns, whose external values compare by
  * reference and must not fragment group slots. */
class ReplicateAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def finish(groupCols: Seq[String]) = { df: org.apache.spark.sql.DataFrame =>
    df.groupBy((groupCols :+ "rep").map(col): _*)
      .agg(sum(col("s1")).as("s1"), sum(col("__pn")).as("n"))
  }

  test("partials + finish equals the explode-based aggregate, nulls included") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), None),
      (None, Some(8L)), (Some("b"), Some(16L)), (None, None))
      .toDF("g", "s1").repartition(3)
    val reps = 4
    val fused = finish(Seq("g"))(
      ReplicateAgg.partials(df, Seq("g"), reps, Seq("s1")))
    val plain = df
      .withColumn("rep", explode(lit((0 until reps).toArray)))
      .groupBy($"g", $"rep")
      .agg(sum(coalesce($"s1", lit(0L))).as("s1"),
        count(lit(1)).as("n"))
    assert(fused.exceptAll(plain).isEmpty && plain.exceptAll(fused).isEmpty,
      s"fused:\n${fused.orderBy("g", "rep").collect().mkString("\n")}\n" +
        s"plain:\n${plain.orderBy("g", "rep").collect().mkString("\n")}")
  }

  test("binary group columns group by VALUE, not array reference") {
    // two distinct Array[Byte] instances with equal contents, across
    // partitions — without key normalization each instance takes its own
    // slot and the per-partition partials fragment
    val df = Seq(
      (Array[Byte](1, 2), 1L), (Array[Byte](1, 2), 2L),
      (Array[Byte](3), 4L), (Array[Byte](1, 2), 8L))
      .toDF("k", "s1").repartition(2)
    val out = finish(Seq("k"))(
      ReplicateAgg.partials(df, Seq("k"), 2, Seq("s1")))
      .collect()
      .map(r => (r.getAs[Array[Byte]]("k").toSeq, r.getInt(1),
        r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (Seq[Byte](1, 2), 0, 11L, 3L), (Seq[Byte](1, 2), 1, 11L, 3L),
      (Seq[Byte](3), 0, 4L, 1L), (Seq[Byte](3), 1, 4L, 1L)))
  }

  test("NESTED binary — array<binary> and struct<binary> keys — group by value") {
    // the reference-equality hazard one level down: equal byte strings
    // inside an array element and inside a struct field; both fragment
    // into per-reference slots unless norm recurses
    val df = Seq(
      ((Seq(Array[Byte](1, 2)), Tuple1(Array[Byte](9))), 1L),
      ((Seq(Array[Byte](1, 2)), Tuple1(Array[Byte](9))), 2L),
      ((Seq(Array[Byte](7)), Tuple1(Array[Byte](9))), 4L))
      .toDF("k", "s1")
      .select(col("k._1").as("ka"), col("k._2").as("ks"), col("s1"))
      .repartition(2)
    val out = finish(Seq("ka", "ks"))(
      ReplicateAgg.partials(df, Seq("ka", "ks"), 1, Seq("s1")))
      .collect()
      .map(r => (r.getAs[Seq[Array[Byte]]]("ka").map(_.toSeq),
        r.getAs[org.apache.spark.sql.Row]("ks")
          .getAs[Array[Byte]](0).toSeq,
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(out === Set(
      (Seq(Seq[Byte](1, 2)), Seq[Byte](9), 3L, 2L),
      (Seq(Seq[Byte](7)), Seq[Byte](9), 4L, 1L)))
  }
}
