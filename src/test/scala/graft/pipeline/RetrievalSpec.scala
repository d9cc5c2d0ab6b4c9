package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.Retrieval

/** Contract of RRF hybrid fusion: rank arithmetic, missing-list behavior
  * (rank 0, contribution 0, never NULL), tie-breaks, and the self-join
  * ranker's agreement with a hand-ranked list. */
class RetrievalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("selfJoinRank reproduces dense ranks with id tie-break") {
    val scored = Seq((10L, 0.5), (11L, 0.9), (12L, 0.5), (13L, 0.1))
      .toDF("id", "score")
    val r = Retrieval.selfJoinRank(scored, "id", "score", "rnk")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // 0.9 -> 1; the 0.5 tie breaks by id (10 before 12); 0.1 last
    assert(r == Map(11L -> 1L, 10L -> 2L, 12L -> 3L, 13L -> 4L))
  }

  test("rrfFuse: both-list docs beat single-list docs at equal rank") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "ra")
    val b = Seq((1L, 2L), (3L, 1L)).toDF("id", "rb")
    val r = Retrieval.rrfFuse(a, b, "id", "ra", "rb").collect()
    val byId = r.map(x => (x.getLong(0), (x.getLong(1), x.getLong(2),
      x.getDouble(3)))).toMap
    // doc 1: 1/61 + 1/62; doc 2: 1/62 only; doc 3: 1/61 only
    assert(math.abs(byId(1L)._3 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
    // missing ranks surface as 0, never null
    assert(byId(2L)._1 == 2L && byId(2L)._2 == 0L)
    assert(byId(3L)._1 == 0L && byId(3L)._2 == 1L)
    // ordering: doc 1 first; 3 (1/61) before 2 (1/62)
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
  }

  test("rrfFuse: equal fused scores tie-break by id; limit bounds output") {
    // a-only rank 1 vs b-only rank 1 -> identical 1/61 contribution
    val a = Seq((5L, 1L)).toDF("id", "ra")
    val b = Seq((4L, 1L)).toDF("id", "rb")
    val r = Retrieval.rrfFuse(a, b, "id", "ra", "rb", limit = 1).collect()
    assert(r.length == 1 && r.head.getLong(0) == 4L)
  }
}
