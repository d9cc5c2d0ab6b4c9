package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the graph-structure signal of
  * clustering/community strength (a web/citation-graph quality feature),
  * via the degree-ordered wedge join (Suri & Vassilvitskii, WWW'11 "the
  * curse of the last reducer").
  *
  * The naive wedge join pairs every two neighbors of every node — a hub
  * with degree d contributes d² wedge rows, so one celebrity node
  * serializes the job. Orienting each undirected edge from its LOWER
  * (degree, id) endpoint to its higher one makes every out-neighborhood
  * O(√m): wedges are built only from each node's out-neighbors, so the
  * per-node work is bounded by m^1.5 total REGARDLESS of hubs — the
  * whole point of the algorithm, and what makes 100 TB graphs feasible.
  * A triangle {u,v,w} (ordered by (degree, id)) is then found exactly
  * once: as the wedge v←u→w closed by the oriented edge v→w.
  *
  * Everything is joins + aggregates over (node, node) pairs — no
  * iteration, no windows, no driver state — and every step is exact
  * ANSI SQL, so the DuckDB oracle (q166) pins per-node counts
  * bit-for-bit. Duplicate edges, reversed duplicates, and self-loops
  * are canonicalized away first (simple undirected graph semantics).
  */
object Triangles {

  // the (degree, id) total order shared by orientation and wedge pairing
  private def lt(d1: Column, n1: Column, d2: Column, n2: Column): Column =
    d1 < d2 || (d1 === d2 && n1 < n2)

  /** Canonical simple undirected edge set: (a < b), self-loops and
    * duplicate/reversed duplicates collapsed. */
  private[graft] def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /** The degree orientation: each canonical edge directed from its LOWER
    * (degree, id) endpoint `u` to its higher one `v` (`dv` = v's degree,
    * the wedge-ordering key). This is the hub-safety mechanism — a
    * celebrity node has the maximal (degree, id), so every one of its
    * edges points INTO it and its out-neighborhood (the only thing the
    * wedge join squares) is EMPTY; out-degrees are O(√m) for every node
    * (Suri–Vassilvitskii lemma). TrianglesSpec pins this structurally on
    * a celebrity fixture: max out-degree stays √m-bounded while the
    * hub's raw degree is ~the whole graph. */
  private[graft] def oriented(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"),
        Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"),
        Seq("b"))
      .select(
        when(lt(col("da"), col("a"), col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(lt(col("da"), col("a"), col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("v"),
        when(lt(col("da"), col("a"), col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("dv"))
  }

  /** Per-node triangle participation counts: one row (node, n_triangles)
    * for every node of at least one triangle. The graph is
    * `edges`(srcCol, dstCol) read as UNDIRECTED; duplicates and
    * self-loops are dropped. Σ n_triangles = 3 × (total triangles). */
  def perNode(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame = {
    val und = canonical(edges, srcCol, dstCol)
    val ori = oriented(und)
    // wedges from each u's (√m-bounded) out-neighborhood, neighbor pair
    // ordered by the same (degree, id) orientation so the closing edge
    // can only be v -> w
    val e1 = ori.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val e2 = ori.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = e1.join(e2, Seq("u"))
      .where(lt(col("dv1"), col("v1"), col("dv2"), col("v2")))
      .select(col("u"), col("v1").as("v"), col("v2").as("w"))
    val tri = wedges.join(
      ori.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Total triangle count (one row). */
  def total(edges: DataFrame, srcCol: String = "src",
            dstCol: String = "dst"): DataFrame =
    perNode(edges, srcCol, dstCol)
      .agg((coalesce(sum(col("n_triangles")), lit(0L)) / 3)
        .cast("long").as("n_triangles"))

  /** Local clustering coefficient per node (Watts & Strogatz 1998):
    * `2·T(v) / (d(v)·(d(v)−1))` — the fraction of a node's neighbor
    * pairs that are themselves adjacent, the standard community-density
    * signal derived from [[perNode]]. Exactness: the numerator and
    * denominator are exact BIGINT products; ONE IEEE double division per
    * row is deterministic on any engine. Degree-1 nodes have no neighbor
    * pair — coefficient 0 by convention. Output: (node, degree,
    * n_triangles, coef) for every node of the canonicalized graph. */
  def clusteringCoef(edges: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = canonical(edges, srcCol, dstCol)
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(perNode(edges, srcCol, dstCol), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("coef",
        when(col("degree") >= 2,
          (lit(2L) * col("n_triangles")).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .otherwise(lit(0.0)))
  }
}
