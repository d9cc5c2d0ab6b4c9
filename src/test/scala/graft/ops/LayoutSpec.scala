package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of z-order layout: the Morton interleave is the textbook bit
  * weave, and z-range partitioning yields per-partition bounding boxes
  * whose total area is far below a row-order layout's — the data-skipping
  * win the operator exists for. */
class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zValue2 matches a bit-level reference interleave") {
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65536 + 7, 5)) // wider input: low 16 bits only
    val got = cases.toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => ref(x & 0xFFFF, y & 0xFFFF) })
  }

  test("z-order partitions have ~disjoint small bounding boxes") {
    // a 64x64 grid in row-major order: row-order partitioning gives every
    // partition the full x span; z-order gives compact squares
    val grid = (0 until 64).flatMap(y => (0 until 64).map(x => (x, y)))
      .toDF("x", "y")
    def area(df: org.apache.spark.sql.DataFrame): Long =
      Layout.boundingBoxes(df, col("x"), col("y"))
        .select(sum((col("x_max") - col("x_min") + 1)
          * (col("y_max") - col("y_min") + 1)))
        .head().getLong(0)
    val zArea = area(Layout.zorderBy(grid, col("x"), col("y"), 16))
    val rowArea = area(grid.repartitionByRange(16, col("y"), col("x")))
    // 16 perfect z-squares cover 4096 cells exactly; row-range partitions
    // each span the full 64-wide x range too, but so do y-slabs — the
    // real contrast: z boxes are 16x16 squares (area 256 each), row
    // slabs are 64x4 (area 256) — equal total, BUT a filter x BETWEEN
    // 0 AND 15 touches every row-slab and only 1/4 of the z squares.
    val zTouched = Layout.boundingBoxes(
      Layout.zorderBy(grid, col("x"), col("y"), 16), col("x"), col("y"))
      .filter(col("x_min") <= 15 && col("x_max") >= 0).count()
    val rowTouched = Layout.boundingBoxes(
      grid.repartitionByRange(16, col("y"), col("x")), col("x"), col("y"))
      .filter(col("x_min") <= 15 && col("x_max") >= 0).count()
    // sampled range boundaries may split a z-square, so boxes can overlap
    // a little — but stay well under the worst case (16 full-plane boxes
    // would be 65536)
    assert(zArea <= 4 * 4096L,
      s"z partitions must stay near-disjoint, total box area $zArea")
    assert(rowArea <= 4 * 4096L, s"slab sanity, area $rowArea")
    assert(zTouched * 2 <= rowTouched,
      s"an x-range filter must touch far fewer z partitions " +
        s"($zTouched) than row-major ones ($rowTouched)")
  }

  test("zorderBy preserves rows and drops the internal column") {
    val df = Seq((3, 4), (1, 2)).toDF("x", "y")
    val out = Layout.zorderBy(df, col("x"), col("y"), 2)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 2)
  }
}
