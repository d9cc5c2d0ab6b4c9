package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Chunking

/** Contract of the sliding-window chunker: offsets and overlap, tail
  * coverage, and the no-doc-disappears edge. */
class ChunkingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("windows slide by stride and cover the tail") {
    // 7 words, window 4, stride 2 -> starts 0,2,4: last covers words 5-7
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val r = Chunking.slidingWindows(df, "doc_id", "text", window = 4,
      stride = 2).orderBy("chunk_idx").collect()
    assert(r.map(_.getString(4)).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7"))
    assert(r.map(_.getLong(3)).toSeq == Seq(0L, 2L, 4L))
    // every word index appears in some chunk
    val covered = r.flatMap(x =>
      x.getString(4).split(" ").map(_.drop(1).toInt)).toSet
    assert(covered == (1 to 7).toSet)
  }

  test("non-overlapping stride == window chunks exactly partition") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val r = Chunking.slidingWindows(df, "doc_id", "text", 2, 2)
      .orderBy("chunk_idx").collect()
    assert(r.map(_.getString(4)).toSeq == Seq("a b", "c d", "e"))
  }

  test("short and empty docs still produce one chunk each") {
    val df = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val r = Chunking.slidingWindows(df, "doc_id", "text", 8, 4)
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getString(4) == "solo")
    assert(r(1).getLong(2) == 0L)
  }
}
