package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.HeavyHitters

class TopKStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** 30k-position stream: 10 hot tokens (2k occurrences each — all above
    * the k=25 threshold of N/25 = 1200), the rest a unique tail — web
    * text's shape, deterministic in the row id. */
  private def stream(): DataFrame =
    spark.range(30000).select(
      when(col("id") < 20000,
        concat(lit("hot"), pmod(col("id"), lit(10)).cast("string")))
        .otherwise(concat(lit("u"), col("id").cast("string")))
        .as("token"))

  private def foldIn(batches: Seq[DataFrame], cap: Int): DataFrame =
    batches.map(TopKState.batchState(_, cap))
      .reduce((a, b) => TopKState.merge(Seq(a, b), cap))

  test("exact hitters from folded state equal the two-pass batch answer") {
    val toks = stream().localCheckpoint(true)
    val batches = (0 until 3).map(b => // deterministic 3-way split
      toks.filter(pmod(abs(hash(col("token"))), lit(3)) === b))
    val state = foldIn(batches, cap = 50)
    val inc = TopKState.exact(state, toks, k = 25)
      .as[(String, Long)].collect().toSet
    val batch = HeavyHitters.exact(toks, k = 25)
      .as[(String, Long)].collect().toSet
    assert(inc === batch)
    assert(inc.nonEmpty, "fixture must produce hitters")
  }

  test("MG invariants hold after merges: bounds, superset, error cap") {
    val toks = stream().localCheckpoint(true)
    val n = toks.count()
    val cap = 40
    val batches = (0 until 5).map(b =>
      toks.filter(pmod(abs(hash(col("token"))), lit(5)) === b))
    val state = foldIn(batches, cap).localCheckpoint(true)
    val meta = state.filter(col("token").isNull)
      .select(col("cnt"), col("err")).head()
    assert(meta.getLong(0) === n, "meta row must carry the exact total")
    val e = meta.getLong(1)
    assert(e <= n / (cap + 1), s"error $e above the N/(cap+1) bound")
    val truth = toks.groupBy(col("token")).agg(count(lit(1)).as("t"))
      .as[(String, Long)].collect().toMap
    val cands = state.filter(col("token").isNotNull)
      .as[(String, Long, Option[Long])].collect()
    assert(cands.length <= cap)
    cands.foreach { case (tok, cnt, _) =>
      val t = truth(tok)
      assert(cnt <= t && t <= cnt + e, s"$tok: cnt=$cnt true=$t err=$e")
    }
    val candSet = cands.map(_._1).toSet
    truth.foreach { case (tok, t) =>
      if (t > e) assert(candSet.contains(tok),
        s"token $tok with true count $t > err $e missing from state")
    }
  }

  test("certified hitters need no scan and never overclaim") {
    val toks = stream().localCheckpoint(true)
    val batches = (0 until 3).map(b =>
      toks.filter(pmod(abs(hash(col("token"))), lit(3)) === b))
    val state = foldIn(batches, cap = 50)
    val certified = TopKState.certified(state, k = 25)
      .as[(String, Long)].collect().toMap
    val exact = HeavyHitters.exact(toks, k = 25)
      .as[(String, Long)].collect().toMap
    assert(certified.keySet.subsetOf(exact.keySet),
      "a certified hitter must be a true hitter")
    certified.foreach { case (tok, lower) =>
      assert(lower <= exact(tok), s"$tok lower bound above true count")
    }
    // the fixture's hot tokens are far above threshold: certification
    // must actually fire, not pass vacuously
    assert(certified.nonEmpty)
  }

  /** Two groups with different shapes: g0 = 20k rows / 10 hot tokens +
    * tail, g1 = 10k rows / 5 hot + tail — thresholds and errors are
    * per-group quantities. */
  private def groupedStream(): DataFrame =
    spark.range(30000).select(
      when(col("id") < 20000, lit("g0")).otherwise(lit("g1")).as("grp"),
      when(col("id") < 14000,
        concat(lit("h"), pmod(col("id"), lit(10)).cast("string")))
        .when(col("id") >= 20000 && col("id") < 27000,
          concat(lit("k"), pmod(col("id"), lit(5)).cast("string")))
        .otherwise(concat(lit("u"), col("id").cast("string")))
        .as("token"))

  test("grouped: folded state + one recount equals per-group exact hitters") {
    val toks = groupedStream().localCheckpoint(true)
    val batches = (0 until 3).map(b =>
      toks.filter(pmod(abs(hash(col("token"))), lit(3)) === b))
    val state = batches.map(TopKState.batchStateBy(_, "grp", capacity = 50))
      .reduce((a, b) => TopKState.mergeBy(Seq(a, b), "grp", 50))
    val inc = TopKState.exactBy(state, toks, "grp", k = 20)
      .as[(String, String, Long)].collect().toSet
    val truth = toks.groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("n")).localCheckpoint(true)
    val totals = toks.groupBy(col("grp")).agg(count(lit(1)).as("t"))
    val exact = truth.join(totals, "grp")
      .filter(col("n") * 20 > col("t"))
      .select("grp", "token", "n")
      .as[(String, String, Long)].collect().toSet
    assert(inc === exact)
    assert(inc.map(_._1) === Set("g0", "g1"),
      "both groups must produce hitters — no vacuous pass")
    // per-group invariants: error cap and meta totals
    val meta = state.filter(col("token").isNull)
      .select("grp", "cnt", "err").as[(String, Long, Long)].collect()
    val nByGroup = totals.as[(String, Long)].collect().toMap
    meta.foreach { case (grp, n, e) =>
      assert(n === nByGroup(grp), s"$grp meta total")
      assert(e <= n / 51, s"$grp error $e above N/(cap+1)")
    }
  }

  test("grouped recount broadcasts candidates — the token stream never " +
      "shuffles on (group, token)") {
    val toks = groupedStream().repartition(6).localCheckpoint(true)
    val state = TopKState.batchStateBy(toks, "grp", 50)
    val counted = TopKState.groupedRecount(toks, state, "grp")
    counted.collect()
    val p = counted.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"grouped candidates must broadcast:\n$p")
    // no exchange may partition the RAW stream on (grp, token): the only
    // token-keyed shuffle allowed is the bounded candidate set's own,
    // and the recount aggregation's exchange is on the folded CASE key
    val rawShuffles = "hashpartitioning\\(grp[#\\d]*, token[#\\d]*,"
      .r.findAllIn(p).size
    assert(rawShuffles <= 1,
      s"raw stream shuffled on (grp, token) ($rawShuffles):\n$p")
    assert(p.contains("hashpartitioning(grp") &&
      p.contains("_groupingexpression"),
      s"recount must aggregate on the folded candidate key:\n$p")
  }

  test("the state is a pure function of the batch sequence (determinism)") {
    val toks = stream().localCheckpoint(true)
    val batches = (0 until 3).map(b =>
      toks.filter(pmod(abs(hash(col("token"))), lit(3)) === b))
    def run() = foldIn(batches, cap = 30)
      .as[(Option[String], Long, Option[Long])].collect().toSet
    assert(run() === run())
  }

  test("a single batch folds to the same exact answer as many") {
    val toks = stream().localCheckpoint(true)
    val one = TopKState.batchState(toks, 50)
    val incOne = TopKState.exact(one, toks, k = 25)
      .as[(String, Long)].collect().toSet
    val batches = (0 until 4).map(b =>
      toks.filter(pmod(abs(hash(col("token"))), lit(4)) === b))
    val incMany = TopKState.exact(foldIn(batches, 50), toks, k = 25)
      .as[(String, Long)].collect().toSet
    assert(incOne === incMany)
  }
}
