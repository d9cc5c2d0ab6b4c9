package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.text.LineClean

/** Contract of the C4/RefinedWeb line-cleaning family: each per-line rule
  * fires exactly where specified (including the terminal-punctuation rule
  * the corpus q-entry configures off), document-level minimums drop whole
  * docs, cleaning is idempotent, and the corpus-global repeated-line
  * removal drops ALL occurrences (first included) while never reordering
  * surviving lines. */
class LineCleanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def textOf(df: DataFrame, id: Long): Option[String] =
    df.where(col("doc_id") === id).collect().headOption.map(_.getString(1))

  // ------------------------------------------------------- per-doc rules

  test("minWords rule drops short lines, keeps long ones") {
    val d = docs((1L, "one two three.\nalpha beta gamma delta epsilon."))
    val out = LineClean.cleanDocs(d, "text", minWords = 5)
    assert(textOf(out, 1L).contains("alpha beta gamma delta epsilon."))
  }

  test("terminal punctuation rule: unpunctuated lines drop when required") {
    val d = docs((1L,
      "a sentence that ends properly today.\n" +
        "a nav bar fragment with no period\n" +
        "did this one end with a question mark?\n" +
        "a quoted ending works too she said\""))
    val out = LineClean.cleanDocs(d, "text", minWords = 3)
    assert(textOf(out, 1L).contains(
      "a sentence that ends properly today.\n" +
        "did this one end with a question mark?\n" +
        "a quoted ending works too she said\""))
    val keptAll = LineClean.cleanDocs(d, "text", minWords = 3,
      requirePunct = false)
    assert(textOf(keptAll, 1L).contains(
      d.collect().head.getString(1)))
  }

  test("blocklist rule is a case-insensitive substring match") {
    val d = docs((1L,
      "enable JavaScript to view this content please.\n" +
        "Lorem Ipsum dolor sit amet placeholder text.\n" +
        "an actual sentence a human wrote down here.\n" +
        "function f() { return 1; } code dump line."))
    val out = LineClean.cleanDocs(d, "text", minWords = 3)
    assert(textOf(out, 1L).contains(
      "an actual sentence a human wrote down here."))
  }

  test("minKeptLines drops the whole document, not just lines") {
    val d = docs(
      (1L, "short\nalso short\nstill short"),
      (2L, "a full sentence with enough words here.\n" +
        "and a second full sentence also survives."))
    val out = LineClean.cleanDocs(d, "text", minWords = 5, minKeptLines = 2)
    assert(out.count() === 1L)
    assert(textOf(out, 1L).isEmpty)
  }

  test("audit columns count total and kept lines") {
    val d = docs((1L, "tiny\na full sentence with enough words here."))
    val row = LineClean.cleanDocs(d, "text", minWords = 5)
      .select("n_lines_total", "n_lines_kept").collect().head
    assert((row.getInt(0), row.getInt(1)) === ((2, 1)))
  }

  test("cleanDocs is idempotent") {
    val d = docs(
      (1L, "drop me\nalpha beta gamma delta epsilon stays here.\n" +
        "zeta eta theta iota kappa also stays fine."),
      (2L, "enable javascript now\nanother proper sentence with words enough.\n" +
        "and one more proper sentence to keep around."))
    val once = LineClean.cleanDocs(d, "text", minWords = 5)
    val twice = LineClean.cleanDocs(
      once.select("doc_id", "text"), "text", minWords = 5)
    assert(twice.orderBy("doc_id").collect().toSeq ===
      once.select("doc_id", "text", "n_lines_total", "n_lines_kept")
        .withColumn("n_lines_total", col("n_lines_kept"))
        .orderBy("doc_id").collect().toSeq)
  }

  // ------------------------------------------------- global line dedup

  test("repeated lines are removed from EVERY document, first included") {
    val d = docs(
      (1L, "cookie banner text\nunique line in doc one"),
      (2L, "cookie banner text\nunique line in doc two"),
      (3L, "only unique content lives here"))
    val out = LineClean.dropRepeatedLines(d, "doc_id", "text")
    assert(textOf(out, 1L).contains("unique line in doc one"))
    assert(textOf(out, 2L).contains("unique line in doc two"))
    assert(textOf(out, 3L).contains("only unique content lives here"))
  }

  test("a line repeated WITHIN one doc does not trip the cross-doc rule") {
    val d = docs((1L, "la la la\nla la la\nsomething else"),
      (2L, "unrelated content"))
    val out = LineClean.dropRepeatedLines(d, "doc_id", "text")
    assert(textOf(out, 1L).contains("la la la\nla la la\nsomething else"))
  }

  test("docs losing every line are dropped; survivors keep line order") {
    val d = docs(
      (1L, "shared one\nshared two"),
      (2L, "shared two\nshared one"),
      (3L, "keep a\nshared one\nkeep b\nshared two\nkeep c"))
    val out = LineClean.dropRepeatedLines(d, "doc_id", "text")
    assert(out.count() === 1L)
    assert(textOf(out, 3L).contains("keep a\nkeep b\nkeep c"))
  }

  test("maxDocs threshold: below it nothing is removed") {
    val d = docs(
      (1L, "shared line\nmine"),
      (2L, "shared line\nyours"))
    val out = LineClean.dropRepeatedLines(d, "doc_id", "text", maxDocs = 3)
    assert(textOf(out, 1L).contains("shared line\nmine"))
  }

  test("extra columns pass through the global dedup") {
    val d = Seq((1L, "en", "shared\nkeep one"), (2L, "de", "shared\nkeep two"))
      .toDF("doc_id", "lang", "text")
    val out = LineClean.dropRepeatedLines(d, "doc_id", "text")
    assert(out.columns.toSeq === Seq("doc_id", "lang", "text"))
    assert(out.where(col("doc_id") === 2L).select("lang", "text")
      .collect().head.toSeq === Seq("de", "keep two"))
  }

  // -------------------------------------------- in-place (broadcast) form

  test("dropRepeatedLinesInPlace equals dropRepeatedLines on every fixture") {
    val fixtures = Seq(
      docs(
        (1L, "cookie banner text\nunique line in doc one"),
        (2L, "cookie banner text\nunique line in doc two"),
        (3L, "only unique content lives here")),
      docs((1L, "la la la\nla la la\nsomething else"),
        (2L, "unrelated content")),
      docs(
        (1L, "shared one\nshared two"),
        (2L, "shared two\nshared one"),
        (3L, "keep a\nshared one\nkeep b\nshared two\nkeep c")),
      // no hot line at all: the broadcast row carries an EMPTY array
      docs((1L, "alpha"), (2L, "beta")),
      // empty-text doc: its single "" line participates like any other
      docs((1L, ""), (2L, ""), (3L, "real content\n")))
    fixtures.foreach { d =>
      val a = LineClean.dropRepeatedLines(d, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val b = LineClean.dropRepeatedLinesInPlace(d, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(b === a)
    }
  }

  test("in-place form on the corpus-lined fixture equals the shuffle form") {
    val lined = graft.queries.PipelineQueries.linedDocs(
      spark, "/root/testdata/sf0.001")
    val a = LineClean.dropRepeatedLines(lined, "doc_id", "text", maxDocs = 2)
      .orderBy("doc_id").collect().toSeq
    val b = LineClean.dropRepeatedLinesInPlace(lined, "doc_id", "text",
      maxDocs = 2).orderBy("doc_id").collect().toSeq
    assert(b === a)
  }

  test("sorted_array_contains agrees with array_contains (randomized)") {
    val rnd = new scala.util.Random(7)
    val vals = (1 to 500).map(_ => rnd.alphanumeric.take(8).mkString)
    val set = vals.filter(_ => rnd.nextBoolean()).distinct.sorted
    val probeDf = vals.toDF("v")
      .crossJoin(broadcast(Seq(Tuple1(set)).toDF("hs")
        .select(array_sort(col("hs")).as("hs"))))
    val got = probeDf.select(col("v"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SortedArrayContains(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("v"))))
        .as("s"),
      array_contains(col("hs"), col("v")).as("a"))
      .collect()
    got.foreach(r => assert(r.getBoolean(1) === r.getBoolean(2), r))
  }

  test("in-place probe plans NO exchange and NO join (pure projection)") {
    val d = docs(
      (1L, "shared one\nkeep a"),
      (2L, "shared one\nkeep b"))
    // the frequency aggregate runs eagerly at construction (one bounded
    // job); the RETURNED frame — the per-doc probe — must be a
    // zero-shuffle, join-free projection: the hot set rides as a literal
    val plan = LineClean.dropRepeatedLinesInPlace(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("in-place form past maxHotSet falls back to the shuffle form") {
    val d = docs(
      (1L, "h1\nh2\nh3\nmine"),
      (2L, "h1\nh2\nh3\nyours"))
    val out = LineClean.dropRepeatedLinesInPlace(d, "doc_id", "text",
      maxHotSet = 2) // 3 hot lines > cap
    val want = LineClean.dropRepeatedLines(d, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(out.orderBy("doc_id").collect().toSeq === want)
  }

  // --------------------------------------------------------- plan shape

  test("cleanDocs plans no exchange (narrow projection at scan speed)") {
    val d = docs((1L, "alpha beta gamma delta epsilon line one."))
    val plan = LineClean.cleanDocs(d, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
