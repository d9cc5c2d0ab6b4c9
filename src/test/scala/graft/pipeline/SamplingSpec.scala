package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Sampling

/** Deterministic md5-bucket sampling: idempotence, rate fidelity, mixture
  * rebalancing math, and the no-shuffle plan contract. */
class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"lang${i % 4}")).toDF("id", "lang")

  test("sampling is idempotent: the same key set is picked on every run") {
    val df = corpus(2000)
    val a = Sampling.sample(df, col("id"), 0.3).select("id").as[Long].collect().sorted
    val b = Sampling.sample(df, col("id"), 0.3).select("id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < 2000)
  }

  test("flat rate lands near the target and nests: sample(0.1) is a subset of sample(0.3)") {
    val df = corpus(5000)
    val s30 = Sampling.sample(df, col("id"), 0.3).select("id").as[Long].collect().toSet
    val s10 = Sampling.sample(df, col("id"), 0.1).select("id").as[Long].collect().toSet
    assert(math.abs(s30.size - 1500) < 150, s"got ${s30.size}, want ~1500")
    assert(math.abs(s10.size - 500) < 90, s"got ${s10.size}, want ~500")
    assert(s10.subsetOf(s30), "thresholded buckets must nest")
  }

  test("stratified rates apply per stratum; default covers unlisted strata") {
    val df = corpus(4000) // 1000 per lang
    val got = Sampling.stratifiedSample(df, "lang", col("id"),
      Map("lang0" -> 0.0, "lang1" -> 1.0), defaultRate = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!got.contains("lang0"), "rate-0 stratum must vanish")
    assert(got("lang1") === 1000L, "rate-1 stratum must be complete")
    assert(math.abs(got("lang2") - 500L) < 80 && math.abs(got("lang3") - 500L) < 80)
  }

  test("rebalanceToMixture hits target proportions without upsampling") {
    // 1600/800/400 rows; equal targets => T = 3*400 = 1200, ~400 per lang.
    val df = ((0 until 1600).map(i => (i.toLong, "a")) ++
      (2000 until 2800).map(i => (i.toLong, "b")) ++
      (4000 until 4400).map(i => (i.toLong, "c"))).toDF("id", "lang")
    val got = Sampling.rebalanceToMixture(df, "lang", col("id"),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got("c") === 400L, "scarcest stratum is kept whole (rate 1)")
    assert(math.abs(got("a") - 400L) < 80, s"got ${got("a")}")
    assert(math.abs(got("b") - 400L) < 80, s"got ${got("b")}")
  }

  test("strata unlisted in the target mixture are dropped") {
    val df = corpus(400)
    val got = Sampling.rebalanceToMixture(df, "lang", col("id"),
      Map("lang0" -> 1.0, "lang1" -> 1.0))
      .select("lang").distinct().as[String].collect().toSet
    assert(got === Set("lang0", "lang1"))
  }

  test("a NULL sampling key raises instead of silently dropping the row") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val err = intercept[Exception] {
      Sampling.sample(df, col("id"), 0.99).collect()
    }
    assert(err.getMessage.contains("NULL sampling key") ||
      Option(err.getCause).exists(_.getMessage.contains("NULL sampling key")),
      s"unexpected error: $err")
  }

  test("a NULL domain raises in token-budget sampling instead of " +
    "silently vanishing through the threshold join") {
    val df = Seq((1L, Option("A"), 10), (2L, Option.empty[String], 10))
      .toDF("id", "dom", "tok")
    val err = intercept[Exception] {
      Sampling.sampleToTokenBudget(df, "dom", col("tok"), col("id"),
        budgetFrac = 0.5, weight = lit(1.0)).collect()
    }
    assert(err.getMessage.contains("NULL domain") ||
      Option(err.getCause).exists(_.getMessage.contains("NULL domain")),
      s"unexpected error: $err")
  }

  test("invalid rates and empty mixtures fail loudly") {
    val df = corpus(10)
    intercept[IllegalArgumentException](Sampling.sample(df, col("id"), 1.5))
    intercept[IllegalArgumentException](
      Sampling.rebalanceToMixture(df, "lang", col("id"), Map.empty))
    intercept[IllegalArgumentException](
      Sampling.rebalanceToMixture(df, "lang", col("id"), Map("lang0" -> -1.0)))
  }

  test("token-budget sampling: rates track token mass, clamp at 1, " +
    "and the kept set is the md5 bucket set") {
    // dom A: 100 docs × 100 tokens = 10000; dom B: 100 docs × 10 = 1000.
    // budgetFrac=0.5, equal weights → budget 5500, per-domain 2750:
    // rate_A = 0.275, rate_B = 1.0 (clamped from 2.75).
    val df = (0 until 200).map(i =>
      (i.toLong, if (i < 100) "A" else "B", if (i < 100) 100 else 10))
      .toDF("id", "dom", "tok")
    val kept = Sampling.sampleToTokenBudget(df, "dom", col("tok"), col("id"),
      budgetFrac = 0.5, weight = lit(1.0))
    val byDom = kept.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(byDom("B") == 100, "under-budget domain must keep everything")
    // A keeps exactly the ids whose md5 bucket < floor(0.275*10000) = 2750
    val thr = 2750L
    val wantA = df.filter(col("dom") === "A")
      .filter(Sampling.bucket(col("id")) < thr)
      .select("id").as[Long].collect().sorted
    val gotA = kept.filter(col("dom") === "A").select("id").as[Long]
      .collect().sorted
    assert(gotA.sameElements(wantA) && gotA.nonEmpty && gotA.length < 100)
  }

  test("token-budget sampling: weights shift the split between domains") {
    val df = (0 until 200).map(i =>
      (i.toLong, if (i < 100) "A" else "B", 50)).toDF("id", "dom", "tok")
    // weight 3 vs 1 at budgetFrac 0.5: budget = 5000, A gets 3750 of
    // 5000 domain tokens (rate .75), B gets 1250 (rate .25)
    val kept = Sampling.sampleToTokenBudget(df, "dom", col("tok"), col("id"),
      budgetFrac = 0.5, weight = when(col("dom") === "A", 3.0).otherwise(1.0))
    val byDom = kept.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    val a = byDom.getOrElse("A", 0L).toDouble / 100
    val b = byDom.getOrElse("B", 0L).toDouble / 100
    assert(a > b, s"weighted domain must keep more (a=$a, b=$b)")
    assert(math.abs(a - 0.75) < 0.15 && math.abs(b - 0.25) < 0.15)
  }

  test("flat and stratified sampling plan zero exchanges; rebalance broadcasts") {
    val df = corpus(100)
    val flat = Sampling.sample(df, col("id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!flat.contains("Exchange"), s"flat sample shuffled:\n$flat")
    val strat = Sampling.stratifiedSample(df, "lang", col("id"),
      Map("lang0" -> 0.2), 0.5).queryExecution.executedPlan.toString
    assert(!strat.contains("Exchange"), s"stratified sample shuffled:\n$strat")
    val reb = Sampling.rebalanceToMixture(df, "lang", col("id"),
      Map("lang0" -> 1.0, "lang1" -> 1.0)).queryExecution.executedPlan.toString
    assert(reb.contains("BroadcastHashJoin") && !reb.contains("SortMergeJoin"),
      s"rebalance must broadcast the threshold table:\n$reb")
  }
}
