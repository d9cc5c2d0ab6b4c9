package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.graph.Triangles

/** Contract of degree-ordered triangle counting: hand-computable graphs
  * give exact per-node counts, bipartite/tree graphs give zero, the
  * canonicalization collapses duplicates/reversals/self-loops, and the
  * result is partitioning-invariant. */
class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(edges: Seq[(String, String)], parts: Int = 1)
      : Map[String, Long] = {
    val df0 = edges.toDF("src", "dst")
    val df: DataFrame = if (parts > 1) df0.repartition(parts) else df0
    Triangles.perNode(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private val k4 = Seq( // complete graph on 4 nodes: 4 triangles
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("c", "d"))

  test("K4: every node sits in exactly 3 of the 4 triangles") {
    assert(counts(k4) === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("sum of per-node counts is 3x the total") {
    val total = Triangles.total(k4.toDF("src", "dst"))
      .head().getLong(0)
    assert(total === 4L)
    assert(counts(k4).values.sum === 3L * total)
  }

  test("triangle-free graphs give an empty result") {
    val star = (1 to 5).map(i => ("hub", s"leaf$i"))
    val bipartite = for (c <- Seq("c1", "c2"); s <- Seq("s1", "s2", "s3"))
      yield (c, s)
    assert(counts(star).isEmpty)
    assert(counts(bipartite).isEmpty)
  }

  test("duplicates, reversed duplicates, and self-loops are canonicalized") {
    val noisy = k4 ++ k4.map(_.swap) ++ k4 ++
      Seq(("a", "a"), ("b", "b"))
    assert(counts(noisy) === counts(k4))
  }

  test("a hub closing one triangle: only the triangle's nodes count") {
    // hub connects to 5 leaves; leaves l1-l2 also connect to each other
    val g = (1 to 5).map(i => ("hub", s"l$i")) ++ Seq(("l1", "l2"))
    assert(counts(g) === Map("hub" -> 1L, "l1" -> 1L, "l2" -> 1L))
  }

  test("two triangles sharing an edge") {
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d"))
    assert(counts(g) ===
      Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("partitioning-invariant") {
    assert(counts(k4, parts = 7) === counts(k4))
  }

  test("celebrity node: orientation keeps every out-neighborhood √m-bounded") {
    // one hub of degree 2000 (≈ the whole graph) + a ring of background
    // edges among the leaves. The naive wedge join would square the
    // hub's neighborhood (C(2000,2) ≈ 2M wedge rows from ONE node — the
    // "last reducer" that serializes the job); the degree orientation
    // points every hub edge INTO the hub, so its out-neighborhood is
    // EMPTY and the max out-degree over the whole graph stays tiny.
    val hub = (1 to 2000).map(i => ("hub", f"l$i%04d"))
    val ring = (1 to 2000).map(i => (f"l$i%04d", f"l${i % 2000 + 1}%04d"))
    val edges = (hub ++ ring).toDF("src", "dst")
    val ori = Triangles.oriented(Triangles.canonical(edges, "src", "dst"))
    val outDeg = ori.groupBy("u")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("od"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = 4000 // canonical edge count
    // hub emits NOTHING; every node's wedge fan-out is O(√m), so the
    // biggest per-node wedge contribution is C(3,2)=3 rows, not 2M
    assert(!outDeg.contains("hub"))
    assert(outDeg.values.max <= math.sqrt(m.toDouble).ceil.toLong,
      s"max out-degree ${outDeg.values.max}")
    // and the counts stay exact: each leaf closes no triangle with the
    // ring alone... except consecutive ring pairs through the hub —
    // (hub, l_i, l_{i+1}) IS a triangle. 2000 of them; hub in all.
    val c = Triangles.perNode(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("hub") === 2000L)
    assert(c(f"l${1}%04d") === 2L) // each leaf sits in 2 ring triangles
    assert(c.values.sum === 3L * 2000L)
  }

  test("clustering coefficient: K4 is fully clustered, paths are not") {
    val coefs = Triangles.clusteringCoef(k4.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // K4: every node degree 3, 3 triangles, coef 2*3/(3*2) = 1.0
    assert(coefs.values.forall(_ == ((3L, 3L, 1.0))))
    // path a-b-c: middle node has the pair but no closure; ends degree 1
    val path = Seq(("a", "b"), ("b", "c"))
    val p = Triangles.clusteringCoef(path.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(p("b") === ((2L, 0L, 0.0)))
    assert(p("a") === ((1L, 0L, 0.0)) && p("c") === ((1L, 0L, 0.0)))
    // one closed + one open wedge at b: coef 2*1/(3*2) = 1/3
    val mixed = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"))
    val m = Triangles.clusteringCoef(mixed.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m("b") === ((3L, 1L, 1.0 / 3.0)))
    assert(m("d") === ((1L, 0L, 0.0)))
  }
}
