package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The THIRD PageRank decade: ×1000 replicas of the corpus graph —
  * 650M edges, 16M nodes at sf0.1 — the scale where the ×100 crossing
  * (Spark wins 8.4×, BENCH_COMPARE r16) either keeps its slope or
  * doesn't. Too heavy for the driver's per-round bench (a single pass
  * is minutes; the DuckDB twin extrapolates to hours), so it lives in
  * this profiling main and its reading is recorded in BENCH_COMPARE
  * with the construction pinned here.
  *
  * Fixture: the corpus graph REBUILT ON INTEGER NODE IDS (customer k →
  * 2k, supplier k → 2k+1 — isomorphic to PageRank.corpusEdges's
  * c<k>/s<k> strings), replica-tagged numerically (id·times + r,
  * disjoint copies). Two reasons, both measured 2026-08-16:
  *  - string ids at 650M edges exceed the host: the cache + per-
  *    iteration shuffle of ~16-byte UTF8 ids spilled through 45 GB of
  *    free disk (and at the engine-default shuffle=cores the 20M-row
  *    dedup partitions starve the hash-aggregate at -Xmx16g —
  *    AGGREGATE_OUT_OF_MEMORY; this is why r15's harness recorded no
  *    number);
  *  - integer ids ARE the production encoding at this scale — a real
  *    650M-edge web graph ships long ids, not entity-name strings.
  * The ×10/×100 bench decades keep the string fixture (they fit
  * easily); this harness runs BOTH ×100 and ×1000 on the long-id
  * fixture so the recorded ×1000 slope is measured against a same-
  * encoding ×100 point, not across encodings.
  *
  * NOTE on what the construction guarantees: the copies are
  * EXCHANGEABLE (replica i's ranks equal replica j's exactly, under
  * the integer fixed-point contract), but NOT equal to the ×1 run's —
  * PageRank normalizes by the global node count, so every rank in a
  * ×times graph is ~times× smaller. The self-check below therefore
  * verifies replica symmetry, not ×1 equality.
  *
  * One timed pass (min-of-N is pointless at these absolutes — the pass
  * itself amortizes every constant), fresh session, shuffle partitions
  * scaled to the DATA (8 per core at ×≥500: each aggregation partition
  * holds ~2.5M rows instead of 20M — the 1000-executor posture scaled
  * down).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=64g \
  *        runMain graft.PageRankDecadeProfile [times]
  */
object PageRankDecadeProfile {
  /** corpusEdges on long ids — isomorphic by construction (see header). */
  private def corpusEdgesLong(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
    val li = graft.Tables.load(s, dir, "lineitem")
    val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
    val fwd = joined.select(
      (col("o_custkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val bwd = joined.where(col("l_suppkey") % 3 === 0).select(
      (col("l_suppkey") * 2 + 1).as("src"),
      (col("o_custkey") * 2).as("dst"))
    fwd.unionAll(bwd)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val times = args.headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    if (times >= 500)
      spark.conf.set("spark.sql.shuffle.partitions", (cpus * 8).toString)

    val path = s"/tmp/graft_prdecade_long_x$times"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      corpusEdgesLong(spark, sfDir)
        .select(col("src"), col("dst"),
          graft.ops.Replicate.rep(times).as("r"))
        .select((col("src") * times + col("r")).as("src"),
          (col("dst") * times + col("r")).as("dst"))
        .repartition(cpus * 8)
        .write.mode("overwrite").parquet(path)
    }
    val e = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val r = graft.graph.PageRank.run(e, iters = 5)
    r.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    // self-verification: replica symmetry (see header)
    val rep0 = r.filter(pmod(col("node"), lit(times)) === 0)
      .select(expr(s"node div $times").as("base"), col("rank"))
    val rep1 = r.filter(pmod(col("node"), lit(times)) === 1)
      .select(expr(s"node div $times").as("base"),
        col("rank").as("rank1"))
    val joined = rep0.join(rep1, Seq("base"), "full")
    val diff = joined
      .filter(col("rank").isNull || col("rank1").isNull ||
        col("rank") =!= col("rank1")).count()
    println(f"[prdecade] x$times%d pagerank $secs%.1f s  rep0_vs_rep1_mismatches=$diff%d")
    spark.stop()
  }
}
