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
  * m_pagerank_x10/x100 (per-copy ranks equal the ×1 run —
  * self-verifying), materialized to scratch parquet untimed. One timed
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
    // self-verification: replica 0's ranks must equal the ×1 run
    val x1 = graft.graph.PageRank.run(
      graft.graph.PageRank.corpusEdges(spark, sfDir), iters = 5)
    val rep0 = r.filter(col("node").endsWith("_0"))
      .select(expr("substring(node, 1, length(node) - 2)").as("node"),
        col("rank"))
    val diff = rep0.join(x1.withColumnRenamed("rank", "rank1"), Seq("node"))
      .filter(col("rank") =!= col("rank1")).count()
    println(f"[prdecade] x$times%d pagerank $secs%.1f s  rep0_mismatches=$diff%d")
    spark.stop()
  }
}
