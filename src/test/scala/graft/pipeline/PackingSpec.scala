package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Packing

/** Sequence packing: the distributed prefix sum must equal the sequential
  * reference exactly, across partition boundaries and long documents. */
class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random token counts. */
  private def toks(n: Int): Seq[(Long, Long)] =
    (0 until n).map(i => (i.toLong, ((i * 2654435761L) % 97 + 3) % 100))

  /** Sequential reference: walk in id order, accumulate, cut at budget. */
  private def reference(rows: Seq[(Long, Long)], budget: Long): Map[Long, (Long, Long, Long)] = {
    var run = 0L
    rows.sortBy(_._1).map { case (id, t) =>
      val start = run; run += t; id -> (t, start, start / budget)
    }.toMap
  }

  test("packing equals the sequential reference exactly, across many partitions") {
    val data = toks(5000)
    val df = data.toDF("doc_id", "n").repartition(16) // scrambled input order
    val got = Packing.packSequences(df, "doc_id", col("n"), 128L)
      .collect().map(p => p.doc_id -> ((p.n_tokens, p.tok_start, p.pack_id))).toMap
    val want = reference(data, 128L)
    assert(got === want)
    assert(got.size === 5000)
  }

  test("documents longer than the budget span windows but keep exact offsets") {
    val data = Seq((0L, 10L), (1L, 300L), (2L, 5L), (3L, 120L))
    val got = Packing.packSequences(data.toDF("doc_id", "n"), "doc_id", col("n"), 100L)
      .collect().map(p => p.doc_id -> ((p.tok_start, p.pack_id))).toMap
    // stream: 0@0(pack0), 1@10(pack0, spans into 3), 2@310(pack3), 3@315(pack3)
    assert(got === Map(0L -> ((0L, 0L)), 1L -> ((10L, 0L)),
      2L -> ((310L, 3L)), 3L -> ((315L, 3L))))
  }

  test("zero-token documents take no space; negative counts fail loudly") {
    val got = Packing.packSequences(
      Seq((0L, 0L), (1L, 7L), (2L, 0L)).toDF("doc_id", "n"), "doc_id", col("n"), 10L)
      .collect().map(p => p.doc_id -> p.tok_start).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 7L))
    val err = intercept[Exception] {
      Packing.packSequences(
        Seq((0L, -5L)).toDF("doc_id", "n"), "doc_id", col("n"), 10L).collect()
    }
    assert(err.getMessage != null)
  }

  test("packing is deterministic run-over-run") {
    val df = toks(2000).toDF("doc_id", "n").repartition(8)
    val a = Packing.packSequences(df, "doc_id", col("n"), 64L)
      .collect().map(p => (p.doc_id, p.tok_start)).sorted
    val b = Packing.packSequences(df, "doc_id", col("n"), 64L)
      .collect().map(p => (p.doc_id, p.tok_start)).sorted
    assert(a.sameElements(b))
  }

  test("no single-partition global window in the plan") {
    val df = toks(100).toDF("doc_id", "n")
    val plan = Packing.packSequences(df, "doc_id", col("n"), 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into packing:\n$plan")
  }

  test("packing scales: 500k docs across 64 partitions keep exact global offsets") {
    // token counts with a closed-form prefix sum: tok(i) = (i%7)+1, one
    // 7-cycle sums to 28 — so correctness is checkable without a local sort
    val n = 500000L
    def cum(i: Long): Long = (i / 7) * 28 + (0L until (i % 7)).map(_ % 7 + 1).sum
    val df = spark.range(n)
      .select(col("id").as("doc_id"), (col("id") % 7 + 1).as("n"))
      .repartition(64)
    val got = Packing.packSequences(df, "doc_id", col("n"), 1000L)
    val sample = got.filter(col("doc_id") % 49999 === 0).collect()
    assert(sample.nonEmpty)
    sample.foreach { p =>
      assert(p.tok_start === cum(p.doc_id), s"doc ${p.doc_id}")
      assert(p.pack_id === p.tok_start / 1000L)
    }
    val (rows, lastEnd) = got.agg(count(lit(1)),
      max(col("tok_start") + col("n_tokens"))).as[(Long, Long)].collect().head
    assert(rows === n)
    assert(lastEnd === cum(n - 1) + ((n - 1) % 7 + 1), "stream length must be exact")
  }

  test("invalid budget fails loudly") {
    intercept[IllegalArgumentException] {
      Packing.packSequences(toks(5).toDF("doc_id", "n"), "doc_id", col("n"), 0L)
    }
  }
}
