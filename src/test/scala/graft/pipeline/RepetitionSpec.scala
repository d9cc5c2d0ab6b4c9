package graft.pipeline

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.Repetition

/** Contract of the repetition/boilerplate filter: hand-computed metrics on
  * known texts, deterministic top-gram tie-break, short-doc edge, and the
  * semi-join filter form. */
class RepetitionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // 6 words, 3 distinct; top bigram "a b" occurs 2x of 5 grams
    (1L, "a b a b c d"),
    // degenerate repetition: one word repeated
    (2L, "spam spam spam spam"),
    // all-distinct
    (3L, "one two three four"),
    // single word: no bigram at all
    (4L, "lonely"),
    // grams: ab ba ac ca ab ba ac -> "a b"=2, "b a"=2, "a c"=2, "c a"=1:
    // three-way tie at the top; the lexicographically largest must win
    (5L, "a b a c a b a c"))
    .toDF("doc_id", "text")

  private lazy val m = Repetition.metrics(docs, "doc_id", "text")
    .orderBy("doc_id").collect()

  private def row(id: Long): Row = m.find(_.getLong(0) == id).get

  test("duplicate-word fraction and top-gram share are exact") {
    val r = row(1L)
    assert(r.getLong(1) == 6L && r.getLong(2) == 4L) // a b c d distinct
    assert(math.abs(r.getDouble(3) - (1.0 - 4.0 / 6.0)) < 1e-15)
    assert(r.getString(4) == "a b" && r.getLong(5) == 2L)
    assert(math.abs(r.getDouble(6) - 2.0 / 5.0) < 1e-15)
  }

  test("degenerate repetition is flagged for drop, clean text kept") {
    val spam = row(2L)
    assert(spam.getDouble(3) == 0.75 && !spam.getBoolean(7))
    val clean = row(3L)
    assert(clean.getDouble(3) == 0.0 && clean.getDouble(6) == 1.0 / 3.0)
    // top_gram_frac 0.333 > 0.05 => dropped despite zero dup words
    assert(!clean.getBoolean(7))
  }

  test("doc shorter than the gram size has empty top_gram and zero fracs") {
    val r = row(4L)
    assert(r.getString(4) == "" && r.getLong(5) == 0L)
    assert(r.getDouble(6) == 0.0)
  }

  test("equal-count grams tie to the lexicographically largest") {
    assert(row(5L).getString(4) == "b a")
  }

  test("charMetrics: hand-computed top-gram and dup-gram char fractions") {
    // "aa bb aa bb cc" -> norm 14 chars; 2-grams: "aa bb"(2), "bb aa"(1),
    // "bb cc"(1); top2 = "aa bb": 2*5/14. 3-grams all unique ->
    // top3 = max cnt 1, ties to largest gram "bb aa bb" (8 chars): 8/14.
    val df = Seq((1L, "aa bb aa bb cc")).toDF("doc_id", "text")
    val r = Repetition.charMetrics(df, "doc_id", "text",
      topNs = Seq(2, 3), dupNs = Seq(2)).collect()(0)
    assert(r.getLong(1) == 14L)
    assert(math.abs(r.getDouble(2) - 10.0 / 14.0) < 1e-15) // top2_frac
    assert(math.abs(r.getDouble(3) - 8.0 / 14.0) < 1e-15)  // top3_frac
    // dup2: only "aa bb" has cnt>=2 -> mass 2*5=10 -> 10/14
    assert(math.abs(r.getDouble(4) - 10.0 / 14.0) < 1e-15)
  }

  test("charMetrics: short and empty docs yield all-zero fractions") {
    val df = Seq((1L, "one"), (2L, "")).toDF("doc_id", "text")
    val rs = Repetition.charMetrics(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 3 chars but no 2..10-gram exists; doc 2: 0 chars
    assert(rs(0).getLong(1) == 3L && rs(1).getLong(1) == 0L)
    for (r <- rs; i <- 2 until r.length) assert(r.getDouble(i) == 0.0)
  }

  test("filter keeps exactly the rows whose metrics pass") {
    // loose thresholds: only the spam doc (dup_word_frac 0.75) trips
    val kept = Repetition.filter(docs, "doc_id", "text",
        maxDupWordFrac = 0.7, maxTopGramFrac = 1.0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }
}
