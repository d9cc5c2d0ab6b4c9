package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Contract of the as-of join: latest at-or-before state per key, equal
  * timestamps include the dim, keys without history get nulls, and every
  * fact row survives exactly once. */
class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dims = Seq(
    (1L, 10L, "v1"), (1L, 20L, "v2"), (2L, 15L, "w1"))
    .toDF("k", "ts", "state")

  private def facts = Seq(
    (100L, 1L, 5L),   // before any dim version -> null
    (101L, 1L, 10L),  // equal ts -> v1 (at-or-before includes equal)
    (102L, 1L, 19L),  // between versions -> v1
    (103L, 1L, 25L),  // after both -> v2
    (104L, 2L, 14L),  // before the only version -> null
    (105L, 3L, 99L))  // key with no dims at all -> null
    .toDF("fid", "k", "ts")

  private lazy val out = AsofJoin
    .asof(facts, dims, "k", "ts", Seq("state"))
    .orderBy("fid").collect()
    .map(r => (r.getLong(0), Option(r.getString(3)))).toMap

  test("latest at-or-before version is attached per fact") {
    assert(out(100L).isEmpty)
    assert(out(101L).contains("v1"))
    assert(out(102L).contains("v1"))
    assert(out(103L).contains("v2"))
    assert(out(104L).isEmpty)
    assert(out(105L).isEmpty)
  }

  test("every fact row survives exactly once with its own columns") {
    val rows = AsofJoin.asof(facts, dims, "k", "ts", Seq("state")).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (100L to 105L).toSeq)
  }

  test("a fact stream never leaks into another key's history") {
    // key 2's w1 (ts 15) must not serve key 1's fact at ts 19
    assert(out(102L).contains("v1"))
  }

  test("seeded fuzz: distributed as-of equals the in-memory reference") {
    val rnd = new scala.util.Random(11)
    // dims unique per (key, ts) — the operator's determinism contract
    val dimRows = rnd.shuffle((0L until 10L).flatMap(k =>
      rnd.shuffle((0L until 50L).toList).take(12).map(ts =>
        (k, ts, s"s$k-$ts")))).toList
    val factRows = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(55).toLong)
    }
    val got = AsofJoin
      .asof(factRows.toDF("fid", "k", "ts"), dimRows.toDF("k", "ts", "state"),
        "k", "ts", Seq("state"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toMap
    val byKey = dimRows.groupBy(_._1)
    for ((fid, k, ts) <- factRows) {
      val want = byKey.getOrElse(k, Nil).filter(_._2 <= ts) match {
        case Nil => None
        case hs  => Some(hs.maxBy(_._2)._3)
      }
      assert(got(fid) == want, s"fact $fid (k=$k ts=$ts)")
    }
  }
}
