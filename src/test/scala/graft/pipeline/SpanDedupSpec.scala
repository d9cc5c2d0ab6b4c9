package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{md5, unhex}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.SpanDedup

/** Contract of corpus-level span dedup: first occurrence (lexicographic
  * (doc, idx) min) wins, later occurrences drop — across documents AND
  * within one — reassembly preserves span order, and the short/null-text
  * edges hold. */
class SpanDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // k=2 spans: doc 1 = ["a b","c d","a b"], doc 2 = ["c d","x y"],
  // doc 3 = ["z"] (short tail), doc 4 = null text.
  private def docs = Seq(
    (1L, Option("a b c d a b")),
    (2L, Option("c d x y")),
    (3L, Option("z")),
    (4L, Option.empty[String]))
    .toDF("doc_id", "text")

  private lazy val out = SpanDedup.clean(docs, "doc_id", "text", k = 2)
    .orderBy("doc_id").collect()

  private def row(id: Long): Row = out.find(_.getLong(0) == id).get

  test("first occurrence wins; cross-doc and within-doc repeats drop") {
    val d1 = row(1L)
    // "a b" appears at idx 0 and 2: only idx 0 survives; "c d" idx 1 is
    // the corpus-first occurrence (doc 1 < doc 2).
    assert(d1.getLong(1) == 3L && d1.getLong(2) == 2L)
    assert(d1.getString(3) == "a b c d")
    val d2 = row(2L)
    // doc 2's "c d" lost to doc 1; "x y" is unique.
    assert(d2.getLong(1) == 2L && d2.getLong(2) == 1L)
    assert(d2.getString(3) == "x y")
  }

  test("a doc shorter than k keeps its single partial span") {
    val d3 = row(3L)
    assert(d3.getLong(1) == 1L && d3.getLong(2) == 1L)
    assert(d3.getString(3) == "z")
  }

  test("null text yields zero spans and an empty clean_text") {
    val d4 = row(4L)
    assert(d4.getLong(1) == 0L && d4.getLong(2) == 0L)
    assert(d4.getString(3) == "")
  }

  test("seeded fuzz: distributed result equals the in-memory reference") {
    // 60 random docs over a 5-word vocabulary at k=2: heavy genuine span
    // duplication. The whole-corpus invariants pin the distributed
    // program against a straight-line in-memory reference: total kept ==
    // |distinct spans| (each span survives exactly once, somewhere), and
    // every doc's n_spans matches its chunk count.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val data = (0L until 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(5))).mkString(" "))
    }
    val out = SpanDedup.clean(data.toDF("doc_id", "text"), "doc_id", "text",
      k = 2).collect()
    def chunks(text: String): Seq[String] =
      text.split(" ").toSeq.grouped(2).map(_.mkString(" ")).toSeq
    val allChunks = data.flatMap { case (_, t) => chunks(t) }
    assert(out.map(_.getLong(2)).sum == allChunks.distinct.size,
      "every distinct span must survive exactly once corpus-wide")
    val byId = data.toMap
    for (r <- out)
      assert(r.getLong(1) == chunks(byId(r.getLong(0))).size)
  }

  test("incremental batches compose to the one-shot corpus dedup") {
    // batch 1 = docs 1-2, batch 2 = docs 3+. Feeding batch 2 the registry
    // accumulated from batch 1 must reproduce clean() over everything.
    val all = docs
    val b1 = all.where($"doc_id" <= 2)
    val b2 = all.where($"doc_id" > 2)
    val empty = Seq.empty[Array[Byte]].toDF("h")
    val s1 = SpanDedup.incremental(b1, "doc_id", "text", empty, k = 2)
    val reg = s1.newSpans.cache()
    val s2 = SpanDedup.incremental(b2, "doc_id", "text", reg, k = 2)
    val got = (s1.cleaned.collect() ++ s2.cleaned.collect())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = SpanDedup.clean(all, "doc_id", "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === want, "batch-by-batch must equal one-shot")
    // the registry only grows by genuinely new spans
    assert(s1.newSpans.count() == 3) // "a b", "c d", "x y"... minus dupes
  }

  test("a registry hit drops the span even as the batch's first occurrence") {
    // the registry contract is newSpans' own 16-byte binary key — build
    // the "already seen" set by running the span through the operator,
    // so the test holds under any key algorithm
    val reg = SpanDedup.incremental(
      Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
      Seq.empty[Array[Byte]].toDF("h"), k = 2).newSpans
    val out = SpanDedup.incremental(
      Seq((9L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text",
      reg, k = 2)
    val r = out.cleaned.collect()(0)
    assert(r.getLong(2) == 1L && r.getString(3) == "c d")
    // exactly one genuinely new span ("c d"), 16 bytes, distinct from
    // the registry key
    val fresh = out.newSpans.collect().map(_.getAs[Array[Byte]](0).toSeq)
    val regKeys = reg.collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(fresh.length == 1 && fresh.head.size == 16 &&
      !regKeys.contains(fresh.head))
  }

  test("SpanHashes kernel: word-sequence equality iff key equality") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def keys(words: Seq[String], k: Int): Seq[Seq[Byte]] = {
      val arr = new GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      val out = graft.functions.SpanHashes.compute(arr, k)
      (0 until out.numElements()).map(i => out.getBinary(i).toSeq)
    }
    // identical word runs key identically regardless of position/doc
    assert(keys(Seq("a", "b", "c", "d"), 2) ==
      Seq(keys(Seq("a", "b"), 2).head, keys(Seq("c", "d"), 2).head))
    // word boundaries are significant: ["ab","c"] != ["a","bc"]
    assert(keys(Seq("ab", "c"), 2) != keys(Seq("a", "bc"), 2))
    // word order is significant
    assert(keys(Seq("a", "b"), 2) != keys(Seq("b", "a"), 2))
    // a short tail span keys differently from the padded span
    assert(keys(Seq("a"), 2).head != keys(Seq("a", ""), 2).head)
    // 16 bytes, empty array yields no spans
    assert(keys(Seq("x"), 3).head.size == 16 && keys(Seq(), 3).isEmpty)
  }

  test("SpanHashes property: key equality iff span word-sequence equality " +
      "(1000 random docs, tiny vocab)") {
    // a 3-word vocabulary and short docs force MANY genuinely-equal spans
    // across docs, so both directions are exercised: a hashing
    // inconsistency breaks ⇒, a collision between distinct spans breaks ⇐
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "c")
    for (k <- 1 to 4) {
      val seen = scala.collection.mutable.Map.empty[Seq[Byte], Seq[String]]
      for (_ <- 1 to 1000) {
        val words = Vector.fill(rnd.nextInt(9))(vocab(rnd.nextInt(3)))
        val arr = new GenericArrayData(
          words.map(w => UTF8String.fromString(w)).toArray[Any])
        val keys = graft.functions.SpanHashes.compute(arr, k)
        val nSpans = (words.length + k - 1) / k
        assert(keys.numElements() === nSpans)
        for (i <- 0 until nSpans) {
          val span = words.slice(i * k, math.min((i + 1) * k, words.length))
          val key = keys.getBinary(i).toSeq
          seen.get(key) match {
            case Some(prev) => assert(prev === span,
              s"collision: $prev and $span share a key at k=$k")
            case None =>
              // ⇒ direction: an equal span elsewhere must have produced
              // this exact key already or will match it later — enforced
              // by the map converging to one entry per distinct span
              seen(key) = span
          }
        }
      }
      // every distinct span seen maps to exactly one key and vice versa
      assert(seen.values.toSeq.distinct.size === seen.size,
        s"two keys map to one span sequence at k=$k")
    }
  }

  test("null-id docs pass through all-kept and never suppress a span") {
    // doc null shares span "a b" with doc 5; the null-id doc keeps ALL
    // its spans (it holds no corpus-order position) and doc 5 — the only
    // ORDERED occurrence — still wins its span rather than losing to an
    // orderless row and vanishing.
    val df = Seq((Option(5L), "a b x x"), (Option.empty[Long], "a b y y"))
      .toDF("doc_id", "text")
    val out = SpanDedup.clean(df, "doc_id", "text", k = 2).collect()
    val d5 = out.find(r => !r.isNullAt(0) && r.getLong(0) == 5L).get
    assert(d5.getLong(1) == 2L && d5.getLong(2) == 2L &&
      d5.getString(3) == "a b x x")
    val dn = out.find(_.isNullAt(0)).get
    assert(dn.getLong(1) == 2L && dn.getLong(2) == 2L &&
      dn.getString(3) == "a b y y")
  }

  test("incremental: null-id rows pass through and register no spans") {
    val empty = Seq.empty[Array[Byte]].toDF("h")
    val step = SpanDedup.incremental(
      Seq((Option.empty[Long], "p q"), (Option(1L), "r s")).toDF(
        "doc_id", "text"),
      "doc_id", "text", empty, k = 2)
    val rows = step.cleaned.collect()
    val dn = rows.find(_.isNullAt(0)).get
    assert(dn.getLong(2) == 1L && dn.getString(3) == "p q")
    // only doc 1's span enters the registry — "p q" stays claimable by a
    // later ordered occurrence
    assert(step.newSpans.count() == 1L)
    val later = SpanDedup.incremental(
      Seq((Option(2L), "p q")).toDF("doc_id", "text"),
      "doc_id", "text", step.newSpans, k = 2)
    assert(later.cleaned.collect()(0).getLong(2) == 1L,
      "an ordered occurrence must not be suppressed by a null-id row")
  }

  test("reassembly preserves original span order, not hash order") {
    val df = Seq((1L, "m m z z a a m m b b")).toDF("doc_id", "text")
    val r = SpanDedup.clean(df, "doc_id", "text", k = 2).collect()(0)
    // spans: "m m","z z","a a","m m","b b" -> second "m m" drops
    assert(r.getString(3) == "m m z z a a b b")
  }
}
