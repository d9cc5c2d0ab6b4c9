package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sim.{ProductQuantize, Similarity}

/** Product quantization: planted-cluster encode/search behavior, the
  * compression contract, and agreement with exact brute-force on
  * structured data. */
class ProductQuantizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** nClusters planted centers, `per` noisy members each: member v of
    * cluster c = unit bump at (c mod dim) plus a small deterministic
    * per-member perturbation elsewhere — clusters are far apart, members
    * close. */
  private def planted(nClusters: Int, per: Int) = {
    val rows = for (c <- 0 until nClusters; v <- 0 until per) yield {
      val emb = Array.fill(dim)(0.05f)
      emb(c % dim) = 1.0f
      emb((c * 3 + v + 1) % dim) += 0.02f * ((v % 3) + 1)
      ((c * per + v).toLong, emb.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("encode: m codes per vector, all in [0, ksub); same planted " +
    "cluster ⇒ same codes") {
    val df = planted(4, 8)
    val model = ProductQuantize.train(df, "vec_id", "embedding", dim,
      m = 4, ksub = 4)
    val enc = ProductQuantize.encode(df, "vec_id", "embedding", model)
      .join(df.select(col("vec_id"), col("cluster")), "vec_id")
      .select(col("vec_id"), col("codes"), col("cluster"))
      .as[(Long, Seq[Long], Int)].collect()
    assert(enc.forall(_._2.length == 4))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 4)))
    // within a planted cluster the dominant coordinate is shared; the
    // subspace containing it must assign every member the same code (the
    // small per-member perturbations may fragment OTHER subspaces — that
    // is PQ's independence property, not an error)
    val subDim = dim / 4
    enc.groupBy(_._3).foreach { case (c, members) =>
      val domSub = (c % dim) / subDim
      val domCodes = members.map(_._2(domSub)).toSet
      assert(domCodes.size == 1,
        s"cluster $c fragmented in its dominant subspace: $domCodes")
    }
  }

  test("adcTopK on planted clusters recovers the brute-force neighborhood") {
    val df = planted(4, 8)
    val model = ProductQuantize.train(df, "vec_id", "embedding", dim,
      m = 4, ksub = 8)
    val queries = df.filter(col("vec_id") % 8 === 0)
    val enc = ProductQuantize.encode(df, "vec_id", "embedding", model)
    val pq = ProductQuantize.adcTopK(enc, queries, "vec_id", "embedding",
      model, k = 7)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding",
      k = 7)
    // top-7 of a query = the 7 other members of its planted cluster;
    // PQ must recover a large majority of each query's true set
    val hits = brute.select(col("q_id"), col("n_id"))
      .join(pq.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
        "left_semi")
      .groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(hits.size == 4)
    hits.foreach { case (q, h) =>
      assert(h >= 5, s"query $q recovered only $h of 7 true neighbors")
    }
  }

  test("adcTopKRerank: exact re-rank restores exact order within the " +
    "shortlist (rank-1 neighbor == brute-force rank-1)") {
    val df = planted(4, 8)
    val model = ProductQuantize.train(df, "vec_id", "embedding", dim,
      m = 4, ksub = 8)
    val queries = df.filter(col("vec_id") % 8 === 0)
    val enc = ProductQuantize.encode(df, "vec_id", "embedding", model)
    val pq = ProductQuantize.adcTopKRerank(df, enc, queries, "vec_id",
      "embedding", model, k = 3, shortlist = 16)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding",
      k = 3)
    val top1 = pq.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> (n, c) }.toMap
    val bruteTop1 = brute.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> (n, c) }.toMap
    assert(top1.keySet == bruteTop1.keySet)
    top1.foreach { case (q, (n, c)) =>
      assert(bruteTop1(q)._1 == n, s"query $q top-1 mismatch")
      assert(math.abs(bruteTop1(q)._2 - c) < 1e-12,
        "re-ranked cosine must be the EXACT cosine")
    }
  }

  test("train fails loudly on a dim/m mismatch") {
    val df = planted(2, 2)
    intercept[IllegalArgumentException] {
      ProductQuantize.train(df, "vec_id", "embedding", dim, m = 5, ksub = 2)
    }
  }

  test("encode kernel == driver-side reference argmax, float and double " +
    "inputs, including a ragged (padded) codebook") {
    import graft.sim.PQModel
    // hand-built ragged model: subspace 0 has 3 centroids, subspace 1 has
    // 2 — the kernel's rectangular padding must not change any code
    def book(cs: Seq[Double]*) = cs.toIndexedSeq.map(c => (c, c.map(x => x * x).sum))
    val model = PQModel(2, 2, IndexedSeq(
      book(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.7, 0.7)),
      book(Seq(-1.0, 0.5), Seq(0.3, 0.3))))
    def ref(v: Seq[Double]): Seq[Long] =
      (0 until 2).map { j =>
        val sub = v.slice(j * 2, j * 2 + 2)
        model.books(j).zipWithIndex.map { case ((c, n2), i) =>
          (sub.zip(c).map { case (a, b) => a * b }.sum - n2 / 2, i)
        }.maxBy { case (s, i) => (s, -i) }._2.toLong
      }
    val vecs = Seq(
      Seq(1.0, 0.1, -0.5, 0.4), Seq(0.1, 1.0, 0.2, 0.2),
      Seq(0.7, 0.7, 0.0, 0.0), Seq(-1.0, -1.0, 1.0, 1.0))
    val dfD = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val gotD = ProductQuantize.encode(dfD, "vec_id", "embedding", model)
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    gotD.foreach { case (id, codes) =>
      assert(codes == ref(vecs(id.toInt)), s"double vec $id") }
    val dfF = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val gotF = ProductQuantize.encode(dfF, "vec_id", "embedding", model)
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    gotF.foreach { case (id, codes) =>
      assert(codes == ref(vecs(id.toInt).map(_.toFloat.toDouble)),
        s"float vec $id") }
  }

  test("encode kernel: null and too-short embeddings yield null codes") {
    import graft.sim.PQModel
    val model = PQModel(2, 2, IndexedSeq.fill(2)(
      IndexedSeq((Seq(1.0, 0.0), 1.0), (Seq(0.0, 1.0), 1.0))))
    val df = Seq(
      (1L, Option(Seq(1.0, 0.0, 0.0, 1.0))),
      (2L, Option.empty[Seq[Double]]),
      (3L, Option(Seq(1.0, 0.0)))) // shorter than m*subDim
      .toDF("vec_id", "embedding")
    val got = ProductQuantize.encode(df, "vec_id", "embedding", model)
      .orderBy("vec_id").as[(Long, Option[Seq[Long]])].collect()
    assert(got(0)._2.isDefined)
    assert(got(1)._2.isEmpty && got(2)._2.isEmpty)
  }

  test("encode stays inside whole-stage codegen (no fallback seam)") {
    import graft.sim.PQModel
    val model = PQModel(2, 2, IndexedSeq.fill(2)(
      IndexedSeq((Seq(1.0, 0.0), 1.0), (Seq(0.0, 1.0), 1.0))))
    val dir = tmpDir("pqenc")
    (0 until 10).map(i => (i.toLong, Seq(i * 1.0, 1.0, 0.5, i * 0.1)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val q = ProductQuantize.encode(spark.read.parquet(dir),
      "vec_id", "embedding", model)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"the pq_encode projection must sit inside a codegen span:\n$plan")
    val generated = q.queryExecution
      .explainString(org.apache.spark.sql.execution.CodegenMode)
    assert(generated.contains("PqEncode.compute"),
      "the generated code must call the fused kernel, not an eval fallback")
  }

  test("codes are deterministic across runs (hash-seeded k-means)") {
    val df = planted(3, 5)
    def run() = {
      val model = ProductQuantize.train(df, "vec_id", "embedding", dim,
        m = 2, ksub = 4)
      ProductQuantize.encode(df, "vec_id", "embedding", model)
        .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    }
    assert(run() == run())
  }
}
