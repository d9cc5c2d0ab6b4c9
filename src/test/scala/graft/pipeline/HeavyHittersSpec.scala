package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** A stream with a known exact answer: token `t_i` appears i times
    * (N = n(n+1)/2). */
  private def zipfy(n: Int) =
    (1 to n).flatMap(i => Seq.fill(i)(f"t$i%03d"))

  test("exact == full groupBy HAVING count*k > N on a known stream") {
    // N = 820, k = 40 → keep tokens with count*40 > 820, i.e. i >= 21
    val toks = spark.createDataset(scala.util.Random.shuffle(zipfy(40)))
      .repartition(7).toDF("token")
    val got = HeavyHitters.exact(toks, 40)
      .orderBy("token").as[(String, Long)].collect().toSeq
    val want = (21 to 40).map(i => (f"t$i%03d", i.toLong))
    assert(got == want)
  }

  test("threshold is strict and integer-exact (count*k == N excluded)") {
    // 4 tokens × 25 occurrences: N = 100. k=4 → 25*4 == 100, strict >
    // excludes all; k=5 → 125 > 100, all four qualify exactly.
    val toks = spark.createDataset(
      (1 to 4).flatMap(i => Seq.fill(25)(s"w$i"))).toDF("token")
    assert(HeavyHitters.exact(toks, 4).count() == 0)
    assert(HeavyHitters.exact(toks, 5).count() == 4)
  }

  test("MG candidates: superset of every token above N/(k+1), " +
    "size bounded by k per partition") {
    val stream = scala.util.Random.shuffle(zipfy(60))
    val toks = spark.createDataset(stream).repartition(5)
    val cands = HeavyHitters.candidates(toks, 8).as[String].collect().toSet
    assert(cands.size <= 8 * 5)
    val n = stream.size
    val heavy = stream.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c > n / (8 + 1) }.keys.toSet
    assert(heavy.subsetOf(cands), s"missing: ${heavy -- cands}")
  }

  test("recount plans a LeftOuter BroadcastHashJoin — the token stream " +
    "never shuffles on token") {
    val toks = spark.createDataset(zipfy(50)).repartition(6).toDF("token")
    val cands = HeavyHitters.candidates(toks.as[String], 10)
    val counted = HeavyHitters.recount(toks, cands, 10)
    counted.collect()
    // keep only the AQE final-plan section: toString repeats the tree
    // under "== Initial Plan ==", which would double-count exchanges
    val p = counted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"candidates must broadcast:\n$p")
    // exactly ONE exchange partitions on a token column: the candidate
    // set's own distinct (bounded at k·partitions rows). A second one
    // would mean the raw token stream itself is shuffling on token — the
    // full-vocabulary shuffle this operator exists to avoid. The recount
    // aggregation's exchange must be on the folded CASE key instead.
    val tokenShuffles =
      "hashpartitioning\\(token".r.findAllIn(p).size
    assert(tokenShuffles <= 1,
      s"raw token stream shuffled on token ($tokenShuffles):\n$p")
    assert(p.contains("hashpartitioning(_groupingexpression"),
      s"recount must aggregate on the folded candidate key:\n$p")
  }

  test("one heavy token in a sea of uniques is found with tiny k") {
    // 500×hot + 2000 uniques: N = 2500. k=6 → 3000 > 2500 (heavy);
    // k=4 → 2000 < 2500 (below threshold, exact filter drops it).
    val stream = Seq.fill(500)("hot") ++ (1 to 2000).map(i => s"u$i")
    val toks = spark.createDataset(scala.util.Random.shuffle(stream))
      .repartition(11).toDF("token")
    val got = HeavyHitters.exact(toks, 6).as[(String, Long)].collect()
    assert(got.toSeq == Seq(("hot", 500L)))
    assert(HeavyHitters.exact(toks, 4).count() == 0)
  }
}
