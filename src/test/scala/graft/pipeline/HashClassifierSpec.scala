package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.HashClassifier

/** Contract of the hashed linear classifier gate: the per-row hash-weight
  * path and the broadcast-join trained-model path agree exactly, margins
  * are exact fixed-point means, and the edge docs behave. */
class HashClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark scala parquet shuffle broadcast"),
    (3L, "zzz"),
    (4L, Option.empty[String].orNull: String))
    .toDF("doc_id", "text")

  test("hash-weight path and weight-table join path agree exactly") {
    val a = HashClassifier.margin(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val w = HashClassifier.hashWeights(docs)
    val b = HashClassifier.marginJoin(docs, "doc_id", "text", w)
      .orderBy("doc_id").collect()
    assert(a.length == b.length)
    for ((x, y) <- a.zip(b)) {
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getLong(1) == y.getLong(1))
      assert(x.getDouble(2) == y.getDouble(2), s"margin mismatch at ${x.getLong(0)}")
      assert(x.getBoolean(3) == y.getBoolean(3))
    }
  }

  test("margin is the exact fixed-point mean of integer bucket weights") {
    val r = HashClassifier.margin(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getLong(1) == 9L)
    assert(d1.getDouble(2) >= -1.0 && d1.getDouble(2) <= 1.0)
    // margin * n * 1000 must be an exact integer (fixed-point contract)
    val recon = d1.getDouble(2) * 9 * 1000.0
    assert(math.abs(recon - math.round(recon)) < 1e-9)
  }

  test("null text yields zero words, zero margin, keep = false") {
    val d4 = HashClassifier.margin(docs, "doc_id", "text")
      .orderBy("doc_id").collect()(3)
    assert(d4.getLong(1) == 0L && d4.getDouble(2) == 0.0 && !d4.getBoolean(3))
  }

  test("the gate genuinely splits a corpus (both verdicts occur)") {
    val many = (0L until 200L).map(i => (i, s"word$i junk$i filler$i body"))
      .toDF("doc_id", "text")
    val ks = HashClassifier.margin(many, "doc_id", "text")
      .select("keep").as[Boolean].collect()
    assert(ks.contains(true) && ks.contains(false))
  }
}
