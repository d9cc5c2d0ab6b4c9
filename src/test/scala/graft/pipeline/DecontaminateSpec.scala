package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Decontaminate

/** Benchmark decontamination: known-overlap corpora, shingle-count
  * exactness, and the broadcast no-corpus-shuffle plan. */
class DecontaminateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("flags exactly the documents sharing an n-gram, with exact counts") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps into the river today"), // shares "quick brown fox jumps"
      (3L, "completely different text with no overlap at all"),
      (4L, "the quick brown fox appears here too")) // shares 1 ("the quick brown fox")
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over a fence")) // 4-grams incl "quick brown fox jumps"
      .toDF("doc_id", "text")
    val got = Decontaminate.flagOverlaps(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench 4-grams: {the quick brown fox, quick brown fox jumps,
    //                 brown fox jumps over, fox jumps over a, jumps over a fence}
    assert(got === Map(
      1L -> 3L, // the quick brown fox | quick brown fox jumps | brown fox jumps over
      2L -> 1L, // quick brown fox jumps ("a quick brown fox" differs)
      4L -> 1L)) // the quick brown fox
    assert(!got.contains(3L), "clean documents must not appear")
  }

  test("documents shorter than n shingle to nothing and never flag") {
    val corpus = Seq((1L, "too short"), (2L, "the quick brown fox is long enough"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "too short"), (10L, "the quick brown fox runs"))
      .toDF("doc_id", "text")
    val got = Decontaminate.flagOverlaps(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("the benchmark side broadcasts; the corpus is never sort-merge joined") {
    val corpus = (0L until 50L).map(i => (i, s"word$i one two three four five"))
      .toDF("doc_id", "text")
    val bench = Seq((0L, "one two three four five")).toDF("doc_id", "text")
    val plan = Decontaminate.flagOverlaps(corpus, bench, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"benchmark shingles must broadcast:\n$plan")
  }
}
