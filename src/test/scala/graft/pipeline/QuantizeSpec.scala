package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sim.Quantize

/** int8 embedding quantization: error bound, zero-vector guard, clamp
  * behavior, and the floor-based rounding contract. */
class QuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def frame(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("reconstruction error is bounded by scale/2 elementwise") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map(_ =>
      Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat))
    val rows = frame(vecs)
      .select(col("id"), Quantize.scaleOf(col("v")).as("s"), col("v"))
      .select(col("id"), col("s"),
        Quantize.maxError(col("v"), col("s")).as("err"))
      .collect()
    rows.foreach { r =>
      val (s, err) = (r.getDouble(1), r.getDouble(2))
      assert(err <= s / 2 + 1e-12, s"id=${r.getLong(0)}: err=$err scale=$s")
    }
  }

  test("round trip: dequantize(quantize(v)) stays within half a step") {
    val v = Array(0.5f, -0.25f, 0.127f, 0.0f, -1.0f, 0.9999f)
    val row = frame(Seq(v))
      .select(Quantize.scaleOf(col("v")).as("s"), col("v"))
      .select(col("s"),
        Quantize.dequantized(Quantize.quantized(col("v"), col("s")), col("s"))
          .as("d"), col("v"))
      .collect().head
    val s = row.getDouble(0)
    val d = row.getSeq[Double](1)
    v.zip(d).foreach { case (x, y) =>
      assert(math.abs(x - y) <= s / 2 + 1e-12, s"$x -> $y (scale $s)") }
  }

  test("zero vectors quantize to all zeros with scale 0, no NaN") {
    val row = frame(Seq(Array(0.0f, 0.0f, 0.0f)))
      .select(Quantize.scaleOf(col("v")).as("s"), col("v"))
      .select(col("s"), Quantize.quantized(col("v"), col("s")).as("q"),
        Quantize.maxError(col("v"), col("s")).as("err"))
      .collect().head
    assert(row.getDouble(0) === 0.0)
    assert(row.getSeq[Long](1) === Seq(0L, 0L, 0L))
    assert(row.getDouble(2) === 0.0)
  }

  test("the max element maps to ±127 and nothing exceeds the clamp") {
    val v = Array(2.0f, -2.0f, 1.0f, 0.004f)
    val row = frame(Seq(v))
      .select(Quantize.scaleOf(col("v")).as("s"), col("v"))
      .select(Quantize.quantized(col("v"), col("s")).as("q"))
      .collect().head
    val q = row.getSeq[Long](0)
    assert(q(0) === 127L && q(1) === -127L)
    assert(q.forall(x => x >= -127L && x <= 127L))
  }

  test("quantized search holds recall >= 0.9 @10 vs exact on the fixture") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val deq = Quantize.int8(e, "vec_id", "embedding")
      .select(col("vec_id"),
        Quantize.dequantized(col("q"), col("scale")).as("d"))
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(graft.sim.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 10))
    val quant = topSet(graft.sim.Similarity.bruteForceTopK(
      deq, deq.filter(col("vec_id") < 8), "vec_id", "d", 10))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("int8 returns one narrow row per vector") {
    val out = Quantize.int8(frame(Seq(
      Array(1.0f, -0.5f), Array(0.25f, 0.75f))), "id", "v")
    assert(out.columns.toSeq === Seq("id", "scale", "q"))
    assert(out.count() === 2L)
  }
}
