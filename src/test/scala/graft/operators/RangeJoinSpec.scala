package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Contract of the bucketized range join: half-open containment, no
  * bucketization duplicates even when intervals span many buckets,
  * per-key isolation, and empty-interval hygiene. */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 99L), (4L, 2L, 5L))
    .toDF("fid", "k", "ts")

  private def intervals = Seq(
    (10L, 1L, 0L, 10L),    // [0,10): catches ts 5, NOT ts 10 (half-open)
    (11L, 1L, 10L, 11L),   // [10,11): catches ts 10
    (12L, 1L, 0L, 100L),   // [0,100): spans many buckets, catches 5,10,99
    (13L, 2L, 6L, 9L),     // wrong window for k=2's ts 5
    (14L, 1L, 50L, 50L))   // empty interval: dropped
    .toDF("iid", "k", "start", "end")

  private lazy val out = RangeJoin
    .rangeJoin(facts, "ts", intervals, "start", "end", Seq("k"),
      bucketWidth = 7L)
    .select("fid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    .toSet

  test("half-open containment with per-key isolation") {
    assert(out == Set((1L, 10L), (1L, 12L), (2L, 11L), (2L, 12L),
      (3L, 12L)))
  }

  test("a many-bucket interval produces each pair exactly once") {
    val rows = RangeJoin.rangeJoin(facts, "ts", intervals, "start", "end",
      Seq("k"), bucketWidth = 3L)
      .select("fid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
  }

  test("bucket width does not change the result") {
    for (w <- Seq(1L, 2L, 13L, 1000L)) {
      val s = RangeJoin.rangeJoin(facts, "ts", intervals, "start", "end",
        Seq("k"), bucketWidth = w)
        .select("fid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(s == out, s"width $w diverged")
    }
  }
}
