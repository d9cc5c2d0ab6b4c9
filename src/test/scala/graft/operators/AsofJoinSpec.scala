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
}
