package graft.pipeline

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.NgramLM

/** Contract of the bigram-LM quality score: hand-computed add-one smoothed
  * NLL on a tiny corpus, short-doc edge, and the "repetitive text scores
  * better than corpus-atypical text" property the filter relies on. */
class NgramLMSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // corpus counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts a·=3, b·=2;
  // V=4 (doc 3's "x" is vocabulary even though it forms no bigram)
  private def docs = Seq(
    (1L, "a b a b"),
    (2L, "a b c"),
    (3L, "x"))
    .toDF("doc_id", "text")

  private lazy val out = NgramLM.bigramScore(docs, "doc_id", "text")
    .orderBy("doc_id").collect()

  private def row(id: Long): Row = out.find(_.getLong(0) == id).get

  test("add-one smoothed mean NLL matches the hand computation") {
    val pAB = 4.0 / 7.0 // (3+1)/(3+1*4)
    val pBA = 2.0 / 6.0 // (1+1)/(2+1*4)
    val pBC = 2.0 / 6.0
    val d1 = row(1L) // bigrams ab, ba, ab
    assert(d1.getLong(1) == 3L)
    assert(math.abs(d1.getDouble(2)
      - -(math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3.0) < 1e-12)
    val d2 = row(2L) // bigrams ab, bc
    assert(d2.getLong(1) == 2L)
    assert(math.abs(d2.getDouble(2)
      - -(math.log(pAB) + math.log(pBC)) / 2.0) < 1e-12)
  }

  test("a doc with fewer than two words scores zero bigrams") {
    val d3 = row(3L)
    assert(d3.getLong(1) == 0L && d3.getDouble(2) == 0.0)
  }

  test("corpus-typical text scores lower NLL than rare continuations") {
    // doc 1 is made of the corpus's dominant bigram; doc 2 ends in a
    // singleton continuation — the filter must rank doc 1 as more fluent.
    assert(row(1L).getDouble(2) < row(2L).getDouble(2))
  }

  test("train/score split: unseen bigrams and contexts back off correctly") {
    val model = NgramLM.train(docs, "doc_id", "text")
    val fresh = Seq(
      (10L, "a b"), // in-model bigram: P = 4/7
      (11L, "a c"), // seen context a (cw=3), unseen bigram: P = 1/(3+4)
      (12L, "q q")) // unseen context: P = 1/(0+4) = 1/V
      .toDF("doc_id", "text")
    val out = NgramLM.score(fresh, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(math.abs(out(0).getDouble(2) - -math.log(4.0 / 7.0)) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - -math.log(1.0 / 7.0)) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - -math.log(1.0 / 4.0)) < 1e-12)
    // the fluency ordering the filter needs: in-model < partial < unseen
    assert(out(0).getDouble(2) < out(2).getDouble(2)
      && out(2).getDouble(2) < out(1).getDouble(2))
  }

  test("perplexityBuckets: thirds partition, lower score = head, " +
    "cutoffs are the exact interpolated percentiles") {
    // 9 docs with strictly increasing atypicality → strictly increasing
    // score; thirds must land 3/3/3 with the most fluent docs in head.
    val corpus = (1L to 9L).map { i =>
      // doc i: the common phrase repeated (9-i) times, then i rare words
      val common = Seq.fill(9 - i.toInt + 1)("a b").mkString(" ")
      val rare = (1 to i.toInt).map(j => s"r${i}x$j").mkString(" ")
      (i, s"$common $rare")
    }.toDF("doc_id", "text")
    val out = NgramLM.perplexityBuckets(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    val scores = out.map(_.getDouble(2))
    assert(scores.sliding(2).forall(p => p(0) < p(1)),
      s"scores must increase with atypicality: ${scores.mkString(",")}")
    val buckets = out.map(_.getString(3)).toSeq
    assert(buckets == Seq("head", "head", "head", "middle", "middle",
      "middle", "tail", "tail", "tail"), buckets.toString)
  }

  test("alpha scales smoothing: larger alpha flattens the model") {
    val flat = NgramLM.bigramScore(docs, "doc_id", "text", alpha = 1e6)
      .orderBy("doc_id").collect()
    // with huge alpha every conditional -> 1/V, so both docs converge
    val s1 = flat(0).getDouble(2)
    val s2 = flat(1).getDouble(2)
    assert(math.abs(s1 - s2) < 1e-6)
    assert(math.abs(s1 - math.log(4.0)) < 1e-3)
  }
}
