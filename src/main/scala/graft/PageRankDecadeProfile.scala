package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The THIRD PageRank decade: ×1000 replicas of the corpus graph —
  * 650M edges, 16M nodes at sf0.1 — the scale where the ×100 crossing
  * (Spark wins 7.9×, BENCH_COMPARE r15) either keeps its slope or
  * doesn't. Too heavy for the driver's per-round bench (a single pass
  * is minutes; the DuckDB twin extrapolates to hours), so it lives in
  * this profiling main and its reading is recorded in BENCH_COMPARE
  * with the construction pinned here.
  *
  * Fixture: the same replica-tagged disjoint construction as
  * m_pagerank_x10/x100. NOTE on what the construction guarantees: the
  * copies are EXCHANGEABLE (replica i's ranks equal replica j's exactly,
  * under the integer fixed-point contract), but NOT equal to the ×1
  * run's — PageRank normalizes by the global node count, so every rank
  * in a ×times graph is ~times× smaller. The self-check below therefore
  * verifies replica symmetry, not ×1 equality. Materialized to scratch
  * parquet untimed. One timed
  * pass (min-of-N is pointless at these absolutes — the pass itself
  * amortizes every constant), fresh session. The edge cache at this
  * size exceeds the executor heap — MEMORY_AND_DISK spills the tail,
  * which is exactly the 1000-executor cluster shape scaled down: the
  * per-iteration join reads a partitioned, mostly-resident edge set.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        runMain graft.PageRankDecadeProfile [times]
  */
object PageRankDecadeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val times = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    val path = s"/tmp/graft_prdecade_x$times"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      graft.graph.PageRank.corpusEdges(spark, sfDir)
        .select(col("src"), col("dst"),
          graft.ops.Replicate.rep(times).as("r"))
        .select(concat(col("src"), lit("_"), col("r")).as("src"),
          concat(col("dst"), lit("_"), col("r")).as("dst"))
        .repartition(cpus * 4)
        .write.mode("overwrite").parquet(path)
    }
    val e = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val r = graft.graph.PageRank.run(e, iters = 5)
    r.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    // self-verification: REPLICA SYMMETRY, not ×1 equality — PageRank.run
    // normalizes by the GLOBAL node count (r0 = scale div N, and base/dang
    // likewise), so in a ×times graph every rank is ~times× smaller than
    // the ×1 run's; what the disjoint construction DOES guarantee is that
    // the copies are exchangeable, and the integer fixed-point contract
    // (order-free integer sums, global scalars shared) makes replica 0's
    // ranks EXACTLY equal replica 1's, node for node.
    val rep0 = r.filter(col("node").endsWith("_0"))
      .select(expr("substring(node, 1, length(node) - 2)").as("node"),
        col("rank"))
    val rep1 = r.filter(col("node").endsWith("_1"))
      .select(expr("substring(node, 1, length(node) - 2)").as("node"),
        col("rank").as("rank1"))
    val joined = rep0.join(rep1, Seq("node"), "full")
    val diff = joined
      .filter(col("rank").isNull || col("rank1").isNull ||
        col("rank") =!= col("rank1")).count()
    println(f"[prdecade] x$times%d pagerank $secs%.1f s  rep0_vs_rep1_mismatches=$diff%d")
    spark.stop()
  }
}
