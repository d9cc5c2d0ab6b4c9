package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The banded-LSH corpus decades at CONSTANT dup density — the claim
  * m_q42_x10's dup-heavy fixture cannot test. That fixture multiplies
  * every near-dup CLUSTER 10× (replicas differ by a 2-token tail), so
  * its output — all pairs within each cluster — grows quadratically in
  * the replica count BY CONTRACT: the right production answer there is
  * duplicate clusters (q68), and the entry's finding is the exact-pair
  * twin's disk-death, not a slope. The 100 TB thesis for the flagship
  * near-dup operator is different: **banded LSH is ~linear in corpus
  * size when dup DENSITY is constant** (candidates are bucket-bounded;
  * a 100× corpus with the same fraction of near-dups costs ~100×, not
  * 100²×). This harness measures that slope.
  *
  * Fixture: documents ×times with EVERY whitespace token suffixed
  * `·r` (replica index). Token salting maps each replica's 2-shingle
  * space bijectively — within a replica the Jaccard structure is
  * ISOMORPHIC to the base corpus — while no shingle is shared across
  * replicas, so cross-replica candidates are zero by construction and
  * the true answer is exactly `times` disjoint copies of the base
  * corpus's exact-Jaccard pair set. Dup density (pairs per doc) is
  * therefore constant across decades: the output grows linearly, and
  * anything superlinear in the measured time is the operator's own
  * scaling, not the answer's.
  *
  * Self-check (replica symmetry, same logic as
  * [[PageRankDecadeProfile]]): per-replica pair counts must all equal
  * the base corpus's pair count — each replica's minhash draws differ
  * (salted shingles hash differently), so equality across all
  * `times` replicas re-validates recall-total banding under `times`
  * independent hash regimes, not just the oracle corpus's. Cross-
  * replica pairs must be ZERO.
  *
  * One timed pass per decade (minutes-scale absolutes amortize every
  * constant), fresh session per invocation, q42's exact parameters
  * (n=2, bands=16, rowsPerBand=8, τ=0.9).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        runMain graft.LshDecadeProfile [times]
  * Readings recorded in BENCH_COMPARE r16.
  */
object LshDecadeProfile {
  /** documents ×times, token-salted per replica (see header). */
  private def saltedDocs(s: SparkSession, dir: String,
      times: Int): DataFrame =
    graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        graft.ops.Replicate.rep(times).as("r"))
      .select(
        (col("doc_id") * times + col("r")).as("doc_id"),
        array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit("·"), col("r").cast("string"))),
          " ").as("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val times = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    val path = s"/tmp/graft_lshdecade_x$times"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      saltedDocs(spark, sfDir, times)
        .repartition(cpus * 4)
        .write.mode("overwrite").parquet(path)
    }
    val d = spark.read.parquet(path)

    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minHashLsh(d, "doc_id", "text", n = 2,
      bands = 16, rowsPerBand = 8, threshold = 0.9)
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // self-check, untimed: re-run the pipeline for the breakdown (the
    // timed pass must not pay a cache of the quadratic-by-contract
    // member expansion)
    val p2 = graft.dedup.Dedup.minHashLsh(d, "doc_id", "text", n = 2,
      bands = 16, rowsPerBand = 8, threshold = 0.9)
    val tagged = p2.select(
      pmod(col("doc_a"), lit(times)).as("ra"),
      pmod(col("doc_b"), lit(times)).as("rb"))
    val cross = tagged.filter(col("ra") =!= col("rb")).count()
    val per = tagged.filter(col("ra") === col("rb"))
      .groupBy(col("ra")).count()
      .agg(min(col("count")).as("mn"), max(col("count")).as("mx"),
        count(lit(1)).as("replicas"))
      .head()
    println(f"[lshdecade] x$times%d lsh $secs%.1f s  pairs=$nPairs%d  " +
      f"cross_replica=$cross%d  per_replica_min=${per.getLong(0)}%d " +
      f"max=${per.getLong(1)}%d over ${per.getLong(2)}%d replicas")
    spark.stop()
  }
}
