package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.{Select, Shuffle}

/** Quality top-p selection (exact vs threshold paths) and deterministic
  * corpus shuffling. */
class SelectShuffleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Deterministic scores with collisions (i % 37) to exercise tie-breaks.
  private def scored(n: Int) =
    (0 until n).map(i => (i.toLong, s"lang${i % 3}", (i * 2654435761L % 37).toDouble))
      .toDF("id", "lang", "score")

  test("topPExact keeps exactly ceil(p * |stratum|) rows per stratum, the best ones") {
    val df = scored(3000) // 1000 per lang
    val got = Select.topPExact(df, "lang",
      Seq(col("score").desc_nulls_last, col("id").asc), 0.25)
    val counts = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(250L))
    // every kept row outranks every dropped row under (score desc, id asc)
    val kept = got.select("lang", "score", "id")
      .as[(String, Double, Long)].collect().groupBy(_._1)
    val all = df.select("lang", "score", "id")
      .as[(String, Double, Long)].collect().groupBy(_._1)
    all.foreach { case (lang, rows) =>
      val want = rows.sortBy(r => (-r._2, r._3)).take(250).map(_._3).toSet
      assert(kept(lang).map(_._3).toSet === want, s"stratum $lang")
    }
  }

  test("topPByThreshold approximates the exact selection per stratum") {
    val df = scored(3000)
    val exact = Select.topPExact(df, "lang",
      Seq(col("score").desc_nulls_last, col("id").asc), 0.25)
      .select("id").as[Long].collect().toSet
    val approx = Select.topPByThreshold(df, "lang", col("score"), 0.25)
      .select("id").as[Long].collect().toSet
    // same threshold region: overlap must dominate; size within tie-slack
    // (37 distinct scores => the boundary score carries many ties)
    assert((exact intersect approx).size >= (exact.size * 0.8).toInt,
      s"exact=${exact.size} approx=${approx.size} overlap=${(exact intersect approx).size}")
    assert(approx.size >= exact.size, "threshold path keeps all boundary ties")
  }

  test("threshold path never shuffles the corpus stream") {
    val plan = Select.topPByThreshold(scored(100), "lang", col("score"), 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"threshold join must broadcast:\n$plan")
  }

  test("deterministicOrder is a permutation, stable across runs, and not identity") {
    val df = (0L until 4000L).toDF("doc_id").repartition(8)
    val a = Shuffle.deterministicOrder(df, "doc_id").collect()
      .map(r => r.doc_id -> r.shuffle_pos).toMap
    val b = Shuffle.deterministicOrder(df, "doc_id").collect()
      .map(r => r.doc_id -> r.shuffle_pos).toMap
    assert(a === b, "shuffle must be reproducible")
    assert(a.values.toSeq.sorted === (0L until 4000L), "positions are a permutation")
    val moved = a.count { case (id, pos) => id != pos }
    assert(moved > 3000, s"order should look shuffled; only $moved ids moved")
  }

  test("train/test split is a disjoint, deterministic partition of the corpus") {
    val df = (0L until 3000L).toDF("id")
    val a = graft.curate.Sampling.split(df, col("id"), 0.2)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a("test") + a("train") === 3000L)
    assert(math.abs(a("test") - 600L) < 90, s"test side ${a("test")} != ~600")
    val b = graft.curate.Sampling.split(df, col("id"), 0.2)
      .filter(col("split") === "test").select("id").as[Long].collect().toSet
    val c = graft.curate.Sampling.split(df, col("id"), 0.2)
      .filter(col("split") === "test").select("id").as[Long].collect().toSet
    assert(b === c, "split must be stable across runs")
  }

  test("stride interleave holds target rates in every prefix (off by at most one stride)") {
    // 400 'a' docs, 400 'b' docs, weights 3:1 — prefix of k must hold
    // ~0.75k a's, within 1
    val df = ((0L until 400L).map(i => (i, "a")) ++
      (1000L until 1400L).map(i => (i, "b"))).toDF("id", "src")
    val ordered = graft.curate.Interleave.byWeight(df, "src", "id",
      Map("a" -> 3.0, "b" -> 1.0))
      .orderBy("pos", "id").select("src").as[String].collect()
    var nA = 0
    ordered.zipWithIndex.take(520).foreach { case (s, i) =>
      if (s == "a") nA += 1
      val k = i + 1
      assert(math.abs(nA - 0.75 * k) <= 1.0 + 1e-9,
        s"prefix $k: ${nA} a's, want ~${0.75 * k}")
    }
  }

  test("interleave fails loudly on a source missing from the mixture") {
    val df = Seq((1L, "a"), (2L, "zz")).toDF("id", "src")
    val err = intercept[Exception] {
      graft.curate.Interleave.byWeight(df, "src", "id", Map("a" -> 1.0)).collect()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no weight"), s"unexpected: $err")
  }

  test("no single-partition global window in the shuffle plan") {
    val plan = Shuffle.deterministicOrder((0L until 100L).toDF("doc_id"), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into shuffle:\n$plan")
  }
}
