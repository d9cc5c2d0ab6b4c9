package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Dedup
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}

/** Contract of [[CdcStreamIngest.toNearDupTable]] — the streaming
  * MinHash-LSH near-dup pipeline:
  *  1. with ids MONOTONE in arrival order, the cleaned table is INVARIANT
  *     under micro-batch boundaries AND equal to the one-shot
  *     `incrementalDedup(empty, corpus)` — because the registry holds
  *     EVERY prior doc (drops included), the drop rule is
  *     "near-duplicates any smaller-id doc", independent of batching;
  *  2. replaying a batch whose registry append committed but whose
  *     checkpoint didn't reproduces the same cleaned rows — the
  *     (lineage, batch_id) registry filter hides the crashed attempt's
  *     own rows from its replay, so a doc never dedups against itself —
  *     and a NEW lineage continues against the accumulated registry;
  *  3. dropped docs ARE registered: a later doc near-duplicating ONLY a
  *     dropped doc is still dropped (the kept-only-registry alternative
  *     would keep it — and be batch-boundary-dependent).
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // word-bigram shingles (n = 2). Docs 1 and 3 are near-identical (J high),
  // doc 4 near-duplicates doc 3 (the already-DROPPED doc) but not doc 1,
  // docs 2 and 5 are unique. Expected kept: 1, 2, 5.
  private def rows: Seq[(Long, String)] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "an entirely different sentence about databases and storage"),
    (3L, "the quick brown fox jumps over the lazy dog today"),
    (4L, "quick brown fox jumps over the lazy dog today again"),
    (5L, "spark structured streaming processes micro batches of files"))

  private def df(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(Long, String)]]): String = {
    val srcDir = tmpDir("snd-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"snd-stage$i")
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

  private def newCleaned(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("snd-clean"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def newRegistry(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("snd-reg"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private def run(srcDir: String, cleaned: KeyedLakeTable = newCleaned(),
      registry: VersionedLakeTable = newRegistry(),
      ckpt: String = tmpDir("snd-ckpt")): KeyedLakeTable = {
    CdcStreamIngest.toNearDupTable(
      spark.readStream.schema(df(rows).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", n = 2, bands = 16, rowsPerBand = 8,
      threshold = 0.5, cleaned, registry, ckpt)
    cleaned
  }

  private def keptIds(t: KeyedLakeTable): Seq[Long] =
    t.read().select($"doc_id").as[Long].collect().sorted.toSeq

  test("monotone-id stream: any split equals the one-shot incremental dedup") {
    val oneShot = Dedup.incrementalDedup(
        df(Seq.empty[(Long, String)]).select($"doc_id", $"text"),
        rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, bands = 16, rowsPerBand = 8,
        threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(oneShot === Seq(1L, 2L, 5L),
      "fixture sanity: docs 3 and 4 must near-dup a smaller-id doc")
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)),
      rows.map(Seq(_)))
    for (s <- splits)
      assert(keptIds(run(writeBatches(s))) === oneShot,
        s"split of sizes ${s.map(_.size)} diverged from one-shot dedup")
  }

  test("a doc near-duplicating only a DROPPED doc is still dropped") {
    // row-at-a-time: doc 3 is dropped in its own batch (dup of 1); doc 4
    // arrives later and pairs only with 3 — a kept-only registry would
    // keep it, the all-docs registry must drop it
    val t = run(writeBatches(rows.map(Seq(_))))
    assert(!keptIds(t).contains(4L),
      "doc 4 must be dropped against the registered-but-dropped doc 3")
  }

  test("a NEW stream lineage continues against the accumulated registry") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    // lineage 1: docs 1-3 (doc 3 drops against doc 1)
    run(writeBatches(Seq(rows.take(3))), cleaned, registry,
      ckpt = tmpDir("snd-lin1"))
    assert(keptIds(cleaned) === Seq(1L, 2L))
    // lineage 2: fresh source AND fresh checkpoint — its batch ids
    // restart at 0, so a bare batch_id filter would hide the whole
    // registry; doc 4 near-dups only the REGISTERED doc 3 and must
    // still drop, doc 5 is novel and must keep
    run(writeBatches(Seq(rows.drop(3))), cleaned, registry,
      ckpt = tmpDir("snd-lin2"))
    assert(keptIds(cleaned) === Seq(1L, 2L, 5L),
      "the second lineage must dedup against the first lineage's registry")
  }

  test("registry compaction between lineages preserves the semantics") {
    // the registry accumulates one append commit per micro-batch;
    // compactSnapshot folds them into one snapshot (the operational
    // move a long-lived registry needs) — the lineage/batch_id columns
    // ride along as data, so a later lineage must still dedup correctly
    val cleaned = newCleaned()
    val registry = newRegistry()
    run(writeBatches(Seq(rows.take(3))), cleaned, registry,
      ckpt = tmpDir("snd-cmp1"))
    registry.compactSnapshot()
    run(writeBatches(Seq(rows.drop(3))), cleaned, registry,
      ckpt = tmpDir("snd-cmp2"))
    assert(keptIds(cleaned) === Seq(1L, 2L, 5L),
      "post-compaction lineage must still see the folded registry")
  }

  test("replay after a committed registry append is idempotent") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    val srcDir = writeBatches(Seq(rows))
    val ckpt = tmpDir("snd-ckpt-replay")
    run(srcDir, cleaned, registry, ckpt)
    val before = keptIds(cleaned)
    assert(registry.read().count() === rows.size.toLong,
      "registry must hold EVERY doc of the batch, drops included")
    // crash simulation: the registry append committed but the
    // foreachBatch checkpoint commit didn't — delete the checkpoint's
    // last commit marker so the engine RE-DELIVERS the final batch with
    // the same lineage and batch id; the (lineage, batch_id) filter
    // must hide the batch's own rows from its replay
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc")) // checksum
      // sidecar: left stale it fails the re-commit's atomic rename
    run(srcDir, cleaned, registry, ckpt)
    assert(keptIds(cleaned) === before,
      "replay must not dedup the batch against its own registry rows")
  }

  test("a checkpoint recreated at the SAME path is a fresh lineage") {
    // the standard reprocess move: delete the checkpoint, keep the
    // registry, restart at the SAME path. Batch ids restart at 0 — a
    // path-string lineage would hide every accumulated registry row
    // with batch_id >= 0 and dedup the new stream against a truncated
    // registry. The persisted-query-id lineage gives the recreated
    // checkpoint a fresh id, so doc 4 must still drop against the
    // REGISTERED (and itself dropped) doc 3 from the first run.
    val cleaned = newCleaned()
    val registry = newRegistry()
    val ckpt = tmpDir("snd-ckpt-recreate")
    run(writeBatches(Seq(rows.take(3))), cleaned, registry, ckpt)
    assert(keptIds(cleaned) === Seq(1L, 2L))
    // wipe the checkpoint wholesale and run new data at the same path
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.toSeq.foreach(rmTree)
      Files.deleteIfExists(p)
    }
    rmTree(Paths.get(ckpt))
    run(writeBatches(Seq(rows.drop(3))), cleaned, registry, ckpt)
    assert(keptIds(cleaned) === Seq(1L, 2L, 5L),
      "a recreated checkpoint must see the whole accumulated registry")
  }
}
