package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.PageRank
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}

/** Contract of [[graft.graph.PageRank.resume]] and
  * [[CdcStreamIngest.toPagerankWarmTable]] — warm-start PageRank
  * maintenance:
  *  1. resume COMPOSES: resume(E, run(E, k1), k2) is bit-equal to
  *     run(E, k1+k2) — the recurrence is memoryless, so a warm start
  *     from iteration k1 lands exactly on iteration k1+k2;
  *  2. resume from an EMPTY prior is bit-equal to the cold run at the
  *     same k (new nodes start at the uniform share — with no prior,
  *     every node does);
  *  3. the CONVERGENCE claim the head exists for: after the graph grows,
  *     k=2 warm-started from the old graph's converged ranks lands at
  *     least as close to the new graph's fixed point (L1, measured
  *     against a deep reference run) as a k=2 cold start — the informed
  *     r0 buys iterations;
  *  4. the streamed head is DETERMINISTIC at a fixed split (bit-equal
  *     across re-runs) and replay-safe: re-delivering the last batch
  *     after its rank append committed but its checkpoint commit was
  *     lost lands on the same bits (the (lineage, batch-id) protocol —
  *     a replayed batch warm-starts from the PREVIOUS batch's ranks,
  *     never its own crashed append).
  */
class StreamingPagerankWarmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // a deterministic 60-node circulant digraph: node i → i+1, i+2 (mod n)
  // for every node, plus i → i+3 for i % 4 == 0; nodes with suffix gaps
  // leave some dangling when restricted to a prefix of the edge list
  private def circulant(n: Int): Seq[(String, String)] =
    (0 until n).flatMap { i =>
      Seq((s"v$i", s"v${(i + 1) % n}"), (s"v$i", s"v${(i + 2) % n}")) ++
        (if (i % 4 == 0) Seq((s"v$i", s"v${(i + 3) % n}")) else Seq.empty)
    }

  private def df(es: Seq[(String, String)]): DataFrame =
    es.toDF("src", "dst")

  private def ranksMap(r: DataFrame): Map[String, Long] =
    r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap

  test("resume composes: resume(E, run(E,3), 2) == run(E,5) bit-for-bit") {
    val e = df(circulant(60))
    val r3 = PageRank.run(e, iters = 3)
    val warm = PageRank.resume(e, r3, iters = 2)
    val cold5 = PageRank.run(e, iters = 5)
    assert(ranksMap(warm) === ranksMap(cold5))
    r3.unpersist(); warm.unpersist(); cold5.unpersist()
  }

  test("resume from an empty prior equals the cold run at the same k") {
    val e = df(circulant(24))
    val empty = Seq.empty[(String, Long)].toDF("node", "rank")
    val warm = PageRank.resume(e, empty, iters = 4)
    val cold = PageRank.run(e, iters = 4)
    assert(ranksMap(warm) === ranksMap(cold))
    warm.unpersist(); cold.unpersist()
  }

  test("resume drops prior rows for departed nodes (scaladoc contract)") {
    // prior knows nodes the current graph no longer contains — their
    // rows must not leak mass into the run: resume with the padded
    // prior is bit-equal to run(E, 3+2) via the compose identity, and
    // departed nodes are absent from the output
    val e = df(circulant(24))
    val r3 = PageRank.run(e, iters = 3)
    val padded = r3.select(col("node"), col("rank"))
      .union(Seq(("ghostA", 123456789L), ("ghostB", 42L))
        .toDF("node", "rank"))
    val warm = PageRank.resume(e, padded, iters = 2)
    val cold5 = PageRank.run(e, iters = 5)
    val m = ranksMap(warm)
    assert(m === ranksMap(cold5))
    assert(!m.contains("ghostA") && !m.contains("ghostB"))
    r3.unpersist(); warm.unpersist(); cold5.unpersist()
  }

  test("resume is partitioning-invariant (integer fixed-point contract)") {
    val e = df(circulant(40))
    val prior = PageRank.run(e.limit(70), iters = 3)
    val a = PageRank.resume(e, prior, iters = 2)
    val b = PageRank.resume(e.repartition(7), prior, iters = 2)
    assert(ranksMap(a) === ranksMap(b))
    prior.unpersist(); a.unpersist(); b.unpersist()
  }

  /** A deep reference run in bounded 5-iteration segments, each segment
    * re-materialized through collected rows: PageRank's LOGICAL plan
    * grows multiplicatively with the iteration count (the per-iteration
    * cache bounds the physical plan, not the analyzer tree — a one-shot
    * 40-iteration run OOMs building tree strings), and the recurrence is
    * memoryless, so run(5) ∘ resume(5)^(k-1) IS run(5k) bit-for-bit
    * (pinned by the compose test above). */
  private def deepRanks(e: DataFrame, segments: Int): Map[String, Long] = {
    val first = PageRank.run(e, iters = 5)
    var m = ranksMap(first); first.unpersist()
    (1 until segments).foreach { _ =>
      val pdf = m.toSeq.toDF("node", "rank")
      val nxt = PageRank.resume(e, pdf, iters = 5)
      m = ranksMap(nxt); nxt.unpersist()
    }
    m
  }

  test("after graph growth, k=2 warm lands closer to the fixed point than k=2 cold") {
    // The claim's regime: a SKEWED graph (hubs — the fixed point is far
    // from uniform, so an informed r0 carries real signal; on a
    // near-regular graph uniform is already the fixed point and warm
    // start has nothing to buy) growing by a SMALL batch (maintenance
    // ingests are small relative to the accumulated graph).
    val n = 100
    val base: Seq[(String, String)] =
      (0 until n).map(i => (s"v$i", s"v${(i * 7 + 3) % n}")) ++
        (0 until n by 2).map(i => (s"v$i", "v0")) ++ // hub
        (0 until n by 5).map(i => (s"v$i", "v1"))    // second hub
    val growth: Seq[(String, String)] =
      Seq(("v97", "v98"), ("v98", "v99"), ("v99", "v97"),
        ("v96", "v0"), ("v95", "v1"))
    val oldE = df(base)
    val newE = df(base ++ growth)
    val prior = PageRank.run(oldE, iters = 8)
    val warm = PageRank.resume(newE, prior, iters = 2)
    val cold = PageRank.run(newE, iters = 2)
    val refM = deepRanks(newE, segments = 8) // 40 iterations
    def l1(m: Map[String, Long]): Long =
      refM.iterator.map { case (n, r) => math.abs(m.getOrElse(n, 0L) - r) }.sum
    val (dWarm, dCold) = (l1(ranksMap(warm)), l1(ranksMap(cold)))
    assert(dWarm <= dCold,
      s"warm start (L1=$dWarm) must not trail an equal-k cold start (L1=$dCold)")
    prior.unpersist(); warm.unpersist(); cold.unpersist()
  }

  // ---- streamed head: determinism at a fixed split + replay safety

  private def edges: Seq[(String, String)] = circulant(20)

  private def edf(es: Seq[(String, String)]): DataFrame =
    es.toDF("src", "dst")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(String, String)]]): String = {
    val srcDir = tmpDir("sprw-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"sprw-stage$i")
      edf(b).repartition(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      val dst = Paths.get(srcDir, s"b$i.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    srcDir
  }

  private def newRanks(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("sprw-ranks"), recordKeys = Seq("node", "batch_id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private def run(srcDir: String, ranks: VersionedLakeTable,
      ckpt: String): Unit = {
    val edgeTable = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("sprw-edges"), recordKeys = Seq("src", "dst"),
      precombine = "update_at", partitionSource = "create_at"))
    CdcStreamIngest.toPagerankWarmTable(
      spark.readStream.schema(edf(edges).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      edgeTable, ranks, itersPerBatch = 2, ckpt)
  }

  private def liveRanks(t: VersionedLakeTable): Map[String, Long] =
    t.read()
      .groupBy(col("node"))
      .agg(max(struct(col("batch_id"), col("rank"))).as("m"))
      .select(col("node"), col("m.rank").as("rank"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("streamed warm head is deterministic at a fixed split and matches the manual fold") {
    val split = Seq(edges.take(20), edges.slice(20, 35), edges.drop(35))
    val r1 = newRanks()
    run(writeBatches(split), r1, tmpDir("sprw-ckpt1"))
    val got = liveRanks(r1)
    // the manual fold: resume over cumulative edge sets, 2 iters each
    var prior = Seq.empty[(String, Long)].toDF("node", "rank")
    var cumulative = Seq.empty[(String, String)]
    split.foreach { b =>
      cumulative = (cumulative ++ b).distinct
      val next = PageRank.resume(edf(cumulative).select(col("src"),
        col("dst")), prior, iters = 2)
      prior = next.select(col("node"), col("rank"))
    }
    assert(got === ranksMap(prior.orderBy("node")))
    // and bit-stable across a re-run of the same split
    val r2 = newRanks()
    run(writeBatches(split), r2, tmpDir("sprw-ckpt2"))
    assert(liveRanks(r2) === got)
  }

  test("replay after a committed rank append is idempotent") {
    val split = Seq(edges.take(25), edges.drop(25))
    val srcDir = writeBatches(split)
    val ranks = newRanks()
    val ckpt = tmpDir("sprw-ckpt-replay")
    run(srcDir, ranks, ckpt)
    val before = liveRanks(ranks)
    // crash simulation: the rank append committed but the foreachBatch
    // checkpoint commit didn't — re-deliver the final batch with the
    // same lineage and batch id
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc"))
    run(srcDir, ranks, ckpt)
    assert(liveRanks(ranks) === before,
      "replay must warm-start from the previous batch's ranks, not its own append")
  }
}
