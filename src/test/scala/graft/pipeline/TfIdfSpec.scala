package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TfIdf

/** Contract of TF-IDF keyword extraction: corpus-wide terms rank below
  * doc-specific ones, ranks are deterministic under ties, and k bounds
  * the output per doc. */
class TfIdfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // "common" is in every doc (df=3 -> lowest idf); each doc has its own
  // marker term (df=1) repeated twice.
  private def docs = Seq(
    (1L, "common alpha alpha common common"),
    (2L, "common beta beta"),
    (3L, "common gamma gamma"))
    .toDF("doc_id", "text")

  test("doc-specific repeated terms outrank the corpus-wide term") {
    val r = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    val top = r.filter(_.getInt(1) == 1).map(x => (x.getLong(0), x.getString(2)))
    assert(top.toSet == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // doc 1: common has tf 3, alpha tf 2: scores 3*3/3=3 vs 2*3/1=6
    val d1 = r.filter(x => x.getLong(0) == 1L).map(_.getString(2)).toSeq
    assert(d1 == Seq("alpha", "common"))
  }

  test("exact-score ties break by term, ranks stay dense and bounded") {
    val tied = Seq((1L, "zz aa")).toDF("doc_id", "text")
    val r = TfIdf.topTerms(tied, "doc_id", "text", k = 5)
      .orderBy("rank").collect()
    // both terms: tf=1, df=1, same score -> lexicographic order
    assert(r.map(_.getString(2)).toSeq == Seq("aa", "zz"))
    assert(r.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("bm25: more query-term mass ranks higher; absent docs don't appear") {
    val corpus = Seq(
      (1L, "spark table query spark table"),
      (2L, "spark filler filler filler filler"),
      (3L, "nothing relevant here at all"),
      (4L, "table query filler filler filler"))
      .toDF("doc_id", "text")
    val r = TfIdf.bm25(corpus, "doc_id", "text", Seq("spark", "table", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r.map(_._1).toSeq.head == 1L, "densest doc must rank first")
    assert(!r.map(_._1).contains(3L), "no-hit docs never appear")
    assert(r.map(_._2).toSeq == r.map(_._2).sortBy(-_).toSeq, "sorted desc")
    // saturation: doc 1 has 2x spark but its score stays below 2x doc 2's
    val s1 = r.toMap.apply(1L); val s2 = r.toMap.apply(2L)
    assert(s1 > s2)
  }

  test("tfidf column is ln-based while ranking stays rational") {
    val r = TfIdf.topTerms(docs, "doc_id", "text", k = 1).collect()
    for (row <- r) {
      val tf = row.getLong(3); val df = row.getLong(4)
      val expect = tf * math.log(3.0 / df)
      assert(math.abs(row.getDouble(5) - (math.rint(expect * 1e6) / 1e6)) < 1e-9)
    }
  }
}
