package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Dedup

/** Batch-over-batch ingestion dedup: provenance-aware drop rules, the
  * never-modify-existing contract, and the loud id-collision guard. */
class IncrementalDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and keeps running far away"

  test("incoming docs duplicating the corpus or an earlier batch doc are dropped") {
    val existing = Seq(
      (1L, base),
      (2L, "a completely different existing document about spark engines"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, base), // dup of existing 1 -> dropped
      (11L, "novel incoming content that matches nothing else at all yes"),
      (12L, "novel incoming content that matches nothing else at all yes"), // dup of 11 -> dropped
      (13L, "another genuinely unique incoming document with its own words"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(11L, 13L))
  }

  test("an incoming doc with a smaller id than its existing duplicate still loses") {
    val existing = Seq((100L, base)).toDF("doc_id", "text")
    val incoming = Seq((5L, base)).toDF("doc_id", "text") // 5 < 100: pair is (5,100)
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9)
      .count()
    assert(got === 0L, "existing corpus must win regardless of id order")
  }

  test("strictIds upgrades an id collision to a raise instead of corrupting provenance") {
    val existing = Seq((1L, "some text here for the test")).toDF("doc_id", "text")
    val incoming = Seq((1L, "other text entirely different")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
        n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9, strictIds = true)
    }
    assert(err.getMessage.contains("globally unique"))
    // default guard is the cheap range check: overlap only warns, the
    // batch still processes (an extra full pass over the lake per batch
    // must be opt-in — ADVICE r6)
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9)
    assert(got.count() === 1L)
  }

  test("disjoint id ranges skip even the exact check under strictIds") {
    val existing = Seq((1L, "some text here for the test")).toDF("doc_id", "text")
    val incoming = Seq((10L, "other text entirely different")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9, strictIds = true)
    assert(got.count() === 1L)
  }

  test("equals the pair-rule reference on a mixed corpus") {
    // existing = odd ids, incoming = even ids; several near-dup clusters
    val texts = Seq(base, base + " extra", "wholly different text one for x",
      "wholly different text two for y z")
    val docs = (0L until 40L).map(i => (i, texts((i % 4).toInt)))
    val existing = docs.filter(_._1 % 2 == 1).toDF("doc_id", "text")
    val incoming = docs.filter(_._1 % 2 == 0).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(existing, incoming, "doc_id", "text",
      n = 2, bands = 16, rowsPerBand = 8, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    // reference: exact pairs over the union, provenance drop rule
    val pairs = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", n = 2, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val drops = pairs.collect { case (_, b) if b % 2 == 0 => b }.toSet ++
      pairs.collect { case (a, b) if a % 2 == 0 && b % 2 == 1 => a }.toSet
    val want = docs.map(_._1).filter(i => i % 2 == 0 && !drops.contains(i)).toSet
    assert(got === want)
  }
}
