package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sim.Similarity
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}

/** Contract of [[CdcStreamIngest.toSemanticDedupTable]] — the streaming
  * SemDeDup pipeline:
  *  1. the streamed result equals manual [[Similarity
  *     .semanticDedupIncremental]] calls in micro-batch order (the wiring
  *     adds nothing and loses nothing);
  *  2. with EMPTY centroids and arrival-monotone ids the kept set is
  *     INVARIANT under micro-batch boundaries — any split of one event
  *     stream keeps the same rows. (With real centroids this is
  *     impossible by construction: the paper ranks within a batch by
  *     csim, so two near-dups falling in one batch vs two resolve their
  *     winner differently — arrival-order mode is the split-invariant
  *     streaming semantics, csim mode the corpus-slice semantics.)
  *  3. replaying a batch whose REGISTRY append committed but whose
  *     checkpoint didn't (the foreachBatch crash window) reproduces the
  *     same kept set — the anti-join self-exclusion + keyed registry
  *     make the replay idempotent instead of dropping every row against
  *     its own registry copy.
  */
class StreamingSemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  /** (vec_id, label, embedding): label 0 holds a near-dup pair (1,2) and
    * an orthogonal 3; label 1 holds a near-dup TRIANGLE (4,5,6) whose
    * kept winner is order-dependent — the case that distinguishes the
    * modes. */
  private def rows: Seq[(Long, Long, Array[Float])] = Seq(
    (1L, 0L, Array(1f, 0f)),
    (2L, 0L, Array(0.99f, 0.141f)),
    (3L, 0L, Array(0f, 1f)),
    (4L, 1L, Array(0.8f, 0.6f)),
    (5L, 1L, Array(0.78f, 0.625f)),
    (6L, 1L, Array(0.82f, 0.573f)))

  private def df(rs: Seq[(Long, Long, Array[Float])]): DataFrame =
    rs.toDF("vec_id", "label", "embedding")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  /** Write each batch as ONE parquet file with strictly increasing
    * mtimes, so FileStreamSource's modification-time order IS the
    * declared arrival order. */
  private def writeBatches(batches: Seq[Seq[(Long, Long, Array[Float])]])
      : String = {
    val srcDir = tmpDir("ssd-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"ssd-stage$i")
      df(b).repartition(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      val dst = Paths.get(srcDir, s"b$i.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    srcDir
  }

  private def newKept(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("ssd-kept"), recordKeys = Seq("vec_id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def newRegistry(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("ssd-reg"), recordKeys = Seq("vec_id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("vec_id")))

  private def emptyCentroids: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("label", "embedding")

  private def centroids: DataFrame =
    df(rows).groupBy($"label")
      .agg(graft.sim.VectorMean.column($"embedding").as("embedding"))
      .localCheckpoint(true)

  private def run(srcDir: String, cents: DataFrame,
      kept: KeyedLakeTable = newKept(),
      registry: VersionedLakeTable = newRegistry(),
      ckpt: String = tmpDir("ssd-ckpt")): KeyedLakeTable = {
    val schema = df(rows).schema
    CdcStreamIngest.toSemanticDedupTable(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(srcDir),
      "vec_id", "embedding", "label", () => cents, tau = 0.9,
      kept, registry, ckpt)
    kept
  }

  private def keptIds(kept: KeyedLakeTable): Set[Long] =
    kept.read().select($"vec_id").as[Long].collect().toSet

  test("streamed pipeline equals manual incremental calls in batch order") {
    val batches = Seq(rows.take(3), rows.drop(3))
    val got = keptIds(run(writeBatches(batches), centroids))
    val reg0 = df(rows).select($"label", lit(0.0).as("nrm"), $"embedding")
      .limit(0)
    val s1 = Similarity.semanticDedupIncremental(df(batches(0)), "vec_id",
      "embedding", "label", centroids, reg0, tau = 0.9)
    val s2 = Similarity.semanticDedupIncremental(df(batches(1)), "vec_id",
      "embedding", "label", centroids, s1.newMembers, tau = 0.9)
    val want = (s1.kept.select($"vec_id").as[Long].collect() ++
      s2.kept.select($"vec_id").as[Long].collect()).toSet
    assert(got === want)
  }

  test("arrival-order mode: kept set invariant under any batching") {
    val splits = Seq(
      Seq(rows),                                  // one batch
      Seq(rows.take(2), rows.slice(2, 5), rows.drop(5)), // 3 uneven
      rows.map(Seq(_)))                           // row-at-a-time
    val keptSets = splits.map(s =>
      keptIds(run(writeBatches(s), emptyCentroids)))
    assert(keptSets.distinct.size === 1,
      s"kept sets diverged across splits: $keptSets")
    // and the set is the arrival-order greedy: 2 drops against 1;
    // triangle 4,5,6 keeps only 4 (5 and 6 both within tau of 4)
    assert(keptSets.head === Set(1L, 3L, 4L))
  }

  test("replay after a committed registry append is idempotent") {
    val kept = newKept()
    val registry = newRegistry()
    val srcDir = writeBatches(Seq(rows))
    run(srcDir, centroids, kept, registry)
    val before = keptIds(kept)
    val regBefore = registry.read()
      .select($"vec_id").as[Long].collect().sorted.toSeq
    // crash simulation: the registry commit survived, the checkpoint
    // didn't — a fresh checkpoint dir replays the whole source against
    // the already-seeded tables
    run(srcDir, centroids, kept, registry, ckpt = tmpDir("ssd-ckpt2"))
    assert(keptIds(kept) === before,
      "replay must not re-decide against the batch's own registry rows")
    assert(registry.read().select($"vec_id").as[Long].collect().sorted
      .toSeq === regBefore,
      "keyed registry must collapse the replayed append on read")
  }
}
