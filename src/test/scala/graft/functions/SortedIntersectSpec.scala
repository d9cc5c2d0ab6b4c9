package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SortedIntersect (merge-scan array intersection) must agree with
  * `array_intersect` bit-for-bit on its contract inputs: sorted
  * ascending, distinct, non-null elements — for all three supported node
  * id types. Randomized agreement plus the edge shapes (empty, disjoint,
  * identical, one-sided containment, null array input). */
class SortedIntersectSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def si(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedIntersect(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  test("randomized agreement with array_intersect: long") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def arr() = (1 to rnd.nextInt(30))
        .map(_ => rnd.nextInt(40).toLong).distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        si(col("a"), col("b")).as("k"),
        array_intersect(col("a"), col("b")).as("r"))
      .where(not(col("k") <=> col("r")))
    assert(diff.count() === 0)
  }

  test("randomized agreement with array_intersect: int and string") {
    val rnd = new scala.util.Random(11)
    val rowsI = (1 to 200).map { _ =>
      def arr() = (1 to rnd.nextInt(30))
        .map(_ => rnd.nextInt(40)).distinct.sorted
      (arr(), arr())
    }
    val diffI = rowsI.toDF("a", "b").select(
        si(col("a"), col("b")).as("k"),
        array_intersect(col("a"), col("b")).as("r"))
      .where(not(col("k") <=> col("r")))
    assert(diffI.count() === 0)
    val rowsS = (1 to 200).map { _ =>
      def arr() = (1 to rnd.nextInt(30))
        .map(_ => f"n${rnd.nextInt(40)}%03d").distinct.sorted
      (arr(), arr())
    }
    val diffS = rowsS.toDF("a", "b").select(
        si(col("a"), col("b")).as("k"),
        array_intersect(col("a"), col("b")).as("r"))
      .where(not(col("k") <=> col("r")))
    assert(diffS.count() === 0)
  }

  test("edge shapes: empty, disjoint, identical, containment, null input") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(2L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L, 9L), Seq(2L, 9L))
    ).toDF("a", "b")
    val got = df.select(si(col("a"), col("b"))).as[Seq[Long]].collect()
    assert(got === Seq(Seq.empty[Long], Seq.empty[Long], Seq(1L, 2L, 3L),
      Seq(2L), Seq(2L, 9L)))
    val nul = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(si(col("a"), col("b"))).collect()
    assert(nul.head.isNullAt(0))
  }

  test("interpreted eval path agrees too (outside codegen)") {
    // force the interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val a = Literal(ArrayData.toArrayData(Array(1L, 4L, 7L)),
      ArrayType(LongType))
    val b = Literal(ArrayData.toArrayData(Array(4L, 6L, 7L)),
      ArrayType(LongType))
    val out = SortedIntersect(a, b).eval(null)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(out === Seq(4L, 7L))
  }
}
