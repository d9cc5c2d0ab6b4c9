package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.Bpe

/** Contract of BPE training: pair counts weight by word frequency, merges
  * follow (count desc, left, right) order, the apply step is
  * leftmost-greedy non-overlapping, and tokenize reproduces the trained
  * segmentation. Fixture is small enough to hand-compute every round. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // corpus: "low" x3, "lowest" x1  (classic Sennrich-style fixture)
  private def corpus = Seq(
    (1L, "low low low lowest")).toDF("doc_id", "text")

  test("char pair counts weight by word frequency") {
    val pc = Bpe.charPairCounts(corpus, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // "low"x3 + "lowest"x1: (l,o)=4, (o,w)=4, (w,e)=1, (e,s)=1, (s,t)=1
    assert(pc(("l", "o")) == 4L && pc(("o", "w")) == 4L)
    assert(pc(("w", "e")) == 1L && pc(("s", "t")) == 1L)
  }

  test("merges follow count-then-lexicographic order, and chain") {
    val m = Bpe.train(corpus, "text", nMerges = 3, minPairCount = 2)
    // round 1: (l,o)=4 ties (o,w)=4 -> (l,o) lexicographically first
    assert(m(0).left == "l" && m(0).right == "o" && m(0).pairCount == 4L)
    // round 2: syms now [lo,w...]: (lo,w)=4 wins
    assert(m(1).left == "lo" && m(1).right == "w" && m(1).pairCount == 4L)
    // round 3: nothing reaches minPairCount=2 -> early stop
    assert(m.length == 2)
  }

  test("applyMerge is leftmost-greedy non-overlapping") {
    val df = Seq((1L, Seq("a", "a", "a"))).toDF("id", "syms")
    val out = df.select(Bpe.applyMerge(org.apache.spark.sql.functions
      .col("syms"), "a", "a").as("m")).head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("tokenize applies the merge table in rank order per word") {
    val m = Bpe.train(corpus, "text", nMerges = 2, minPairCount = 2)
    val toks = Bpe.tokenize(Seq((1L, "low lowest")).toDF("id", "text"),
      "text", m).head().getSeq[String](2)
    // merges: (l,o) then (lo,w) -> "low" = [low]; "lowest" = [low,e,s,t]
    assert(toks == Seq("low", "low", "e", "s", "t"))
  }

  test("trainTable round-trips the merge list as a DataFrame") {
    val t = Bpe.trainTable(spark, corpus, "text", nMerges = 2)
      .orderBy("rank").collect()
    assert(t.map(_.getString(3)).toSeq == Seq("lo", "low"))
    assert(t.map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("tokenizeFast == tokenize on adversarial overlap fixtures") {
    // the exact cases where the double-separator replace chain could
    // diverge from the fold: back-to-back candidate pairs sharing a
    // boundary, odd runs, multi-char (post-merge) pair symbols, and a
    // cascade up to a whole-word token
    val merges = Seq(
      Bpe.Merge(1, "a", "b", "ab", 0L),
      Bpe.Merge(2, "ab", "ab", "abab", 0L),
      Bpe.Merge(3, "c", "c", "cc", 0L),
      Bpe.Merge(4, "abab", "x", "ababx", 0L))
    val df = Seq(
      (1L, "abababab ababab abab ab a b"),
      (2L, "ccc cccc ccccc c cc"),
      (3L, "abababx ababxy xabab"),
      (4L, "zzz abcabc aabb")).toDF("doc_id", "text")
    val slow = Bpe.tokenize(df, "text", merges).select("doc_id", "tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = Bpe.tokenizeFast(df, "text", merges).select("doc_id", "tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === slow)
    // spot-check the hand-computed expectations, not just agreement
    assert(slow(1L) == Seq("abab", "abab", "abab", "ab", "abab", "ab", "a", "b"))
    assert(slow(2L) == Seq("cc", "c", "cc", "cc", "cc", "cc", "c", "c", "cc"))
  }

  test("tokenizer strips U+001F — tokenizeFast's separator precondition") {
    // tokenizeFast seeds each word with U+001F separators; a word
    // containing that byte would make the representation ambiguous. The
    // precondition is enforced one layer down: FastTokens emits only
    // [a-z0-9] bytes, so control characters are deleted before seeding.
    // This pin fails loudly if the tokenizer ever passes them through.
    val df = Seq((1L, "abcd ef gh")).toDF("doc_id", "text")
    val toks = df.select(graft.text.TextOps.tokens(
      org.apache.spark.sql.functions.col("text")).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("abcd", "ef", "gh"))
    // and the fast/slow equality holds on the stripped form
    val merges = Seq(Bpe.Merge(1, "a", "b", "ab", 0L))
    val slow = Bpe.tokenize(df, "text", merges).select("tokens")
      .head().getSeq[String](0)
    val fast = Bpe.tokenizeFast(df, "text", merges).select("tokens")
      .head().getSeq[String](0)
    assert(fast === slow)
  }

  test("tokenizeFast == tokenize on the real corpus with trained merges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.train(docs, "text", nMerges = 8)
    val slow = Bpe.tokenize(docs, "text", m)
      .select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = Bpe.tokenizeFast(docs, "text", m)
      .select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === slow)
  }
}
