package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sink.{FileStatsIndex, LakeTableSpec, VersionedLakeTable}

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zvalue is the Morton interleave on a known grid") {
    // a, b in 0..3 with bits = 2: min/max scaling maps each value to its
    // own bucket, so z must be the textbook interleave — bit j of a at
    // position 2j, bit j of b at position 2j+1
    val df = (for { a <- 0 to 3; b <- 0 to 3 } yield (a, b)).toDF("a", "b")
    val z = df.select(col("a"), col("b"),
      ZOrder.zvalue(df, Seq("a", "b"), bits = 2).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def morton(a: Int, b: Int): Long =
      (0 until 2).map { j =>
        (((a >> j) & 1).toLong << (2 * j)) | (((b >> j) & 1).toLong << (2 * j + 1))
      }.reduce(_ | _)
    for { a <- 0 to 3; b <- 0 to 3 }
      assert(z((a, b)) === morton(a, b), s"z($a, $b)")
    // neighbors in z-space share high bits: the full grid in z order
    // visits the classic N-shaped curve
    assert(z((0, 0)) === 0L && z((1, 0)) === 1L &&
      z((0, 1)) === 2L && z((1, 1)) === 3L && z((2, 0)) === 4L &&
      z((3, 3)) === 15L)
  }

  test("nulls land in bucket 0, NaN in the top bucket, constant column in 0") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (null, 5L), (Double.NaN, 5L), (1.0, 5L), (3.0, 5L))
      .toDF("x", "k")
    val z = df.select(ZOrder.zvalue(df, Seq("x", "k"), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    // k is constant => contributes 0 everywhere; x: null -> 0, NaN -> 3,
    // 1.0 -> 0 (min), 3.0 -> 3 (capped top)
    assert(z(0) === 0L)                      // null
    assert(z(1) === morton1(3))              // NaN -> top bucket
    assert(z(2) === 0L)                      // min value
    assert(z(3) === morton1(3))              // max value -> top bucket
  }
  // bucket -> z when only column 0 (of 2) varies with bits = 2
  private def morton1(bucket: Int): Long =
    (0 until 2).map(j => (((bucket >> j) & 1).toLong << (2 * j))).reduce(_ | _)

  test("unsupported z-column types are rejected loudly") {
    val df = Seq(("a", 1)).toDF("s", "i")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zvalue(df, Seq("s", "i"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("optimizeZOrder preserves content, commits a new version, and " +
      "prunes range predicates on BOTH z-columns") {
    // 4096 keys in one partition dir, x and y independent uniform 0..63;
    // 256 rows/file => 16 files after the rewrite
    val rows = spark.range(4096).select(
      concat(lit("k-"), col("id").cast("string")).as("id"),
      lit("2024-01-01 00:00:00.000000").as("create_at"),
      lit("2024-02-01 00:00:00.000000").as("update_at"),
      (col("id") % 64).as("x"),
      (col("id") / lit(64)).cast("double").as("y"))
    val table = new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("zlake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"),
      statsCols = Seq("x", "y"), maxRecordsPerFile = 256)
    val v0 = table.upsert(rows)
    val v1 = table.optimizeZOrder(Seq("x", "y"), bits = 6)
    assert(v1 === v0 + 1, "the rewrite must commit a fresh version")

    // content identical, including through time travel to the pre-rewrite
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "x", "y").as[(String, Long, Double)].collect().toSet
    val expected = key(rows.select(col("id"), col("x"), col("y")))
    assert(key(table.read()) === expected)
    assert(key(table.read(Some(v0))) === expected)

    // the z-layout must make files selective on EITHER column: an eighth
    // of the value space on x (and then y) may overlap at most half of
    // the files (a linear layout leaves one column at ~every file)
    val (keptX, totX) =
      table.pruneReport(None, FileStatsIndex.range("x", Some(0L), Some(7L)))
    val (keptY, totY) =
      table.pruneReport(None, FileStatsIndex.range("y", Some(0.0), Some(7.0)))
    assert(totX === totY && totX >= 8, s"want >= 8 files, got $totX")
    assert(keptX * 2 <= totX, s"x-range kept $keptX of $totX files")
    assert(keptY * 2 <= totY, s"y-range kept $keptY of $totY files")

    // pruned read + residual filter == plain filtered read, both columns
    // (bounds typed to the column — the stats compare is kind-directed)
    def filtered(c: String, lo: Any, hi: Any) = {
      val pruned = table.readWhereStats(None, keepFile =
          FileStatsIndex.range(c, Some(lo), Some(hi)))
        .filter(col(c).between(lit(lo), lit(hi)))
      val plain = table.read().filter(col(c).between(lit(lo), lit(hi)))
      (key(pruned), key(plain))
    }
    val (px, fx) = filtered("x", 0L, 7L)
    assert(px === fx)
    val (py, fy) = filtered("y", 0.0, 7.0)
    assert(py === fy)
  }

  test("a linear clusterBy layout cannot prune the second column (contrast)") {
    val rows = spark.range(4096).select(
      concat(lit("k-"), col("id").cast("string")).as("id"),
      lit("2024-01-01 00:00:00.000000").as("create_at"),
      lit("2024-02-01 00:00:00.000000").as("update_at"),
      (col("id") % 64).as("x"),
      (col("id") / lit(64)).cast("double").as("y"))
    val table = new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("linlake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"),
      statsCols = Seq("x", "y"), maxRecordsPerFile = 256,
      clusterBy = Seq("x"))
    table.upsert(rows)
    table.compactSnapshot()
    // y is uncorrelated with the x-clustered order: an eighth of y-space
    // still overlaps every file
    val (kept, tot) =
      table.pruneReport(None, FileStatsIndex.range("y", Some(0.0), Some(7.0)))
    assert(tot >= 8 && kept === tot,
      s"linear layout unexpectedly pruned y: $kept of $tot")
  }
}
