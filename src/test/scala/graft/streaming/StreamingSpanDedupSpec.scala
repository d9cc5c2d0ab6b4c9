package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.SpanDedup
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}

/** Contract of [[CdcStreamIngest.toSpanDedupTable]] — the streaming C4
  * span-dedup pipeline:
  *  1. with ids MONOTONE in arrival order, the cleaned table is
  *     INVARIANT under micro-batch boundaries AND equal to the one-shot
  *     [[SpanDedup.clean]] (batch order = corpus order, so incremental
  *     composition collapses to the batch operator's own contract);
  *  2. replaying a batch whose registry append committed but whose
  *     checkpoint didn't (the foreachBatch crash window) reproduces the
  *     same cleaned rows — the (lineage, batch_id) registry filter
  *     hides the crashed attempt's own spans from its replay, so a doc
  *     is never deduped against itself;
  *  3. a NEW stream lineage (fresh checkpoint, new data, same registry)
  *     continues against the ACCUMULATED registry — batch ids restart
  *     at 0, so this is exactly what a bare batch-id filter would break.
  */
class StreamingSpanDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // heavy genuine span duplication across the arrival order (k = 2):
  // doc 3 repeats doc 1's spans, doc 4 repeats doc 2's and itself
  private def rows: Seq[(Long, String)] = Seq(
    (1L, "a b c d"),
    (2L, "x y a b"),
    (3L, "a b c d e"),
    (4L, "x y x y z"),
    (5L, "c d q r"))

  private def df(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(Long, String)]]): String = {
    val srcDir = tmpDir("ssp-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"ssp-stage$i")
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
      tmpDir("ssp-clean"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def newRegistry(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("ssp-reg"), recordKeys = Seq("h"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private def run(srcDir: String, cleaned: KeyedLakeTable = newCleaned(),
      registry: VersionedLakeTable = newRegistry(),
      ckpt: String = tmpDir("ssp-ckpt")): KeyedLakeTable = {
    CdcStreamIngest.toSpanDedupTable(
      spark.readStream.schema(df(rows).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", k = 2, cleaned, registry, ckpt)
    cleaned
  }

  private def result(t: KeyedLakeTable): Seq[(Long, Long, Long, String)] =
    t.read().select($"doc_id", $"n_spans", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  test("monotone-id stream: any split equals the one-shot clean") {
    val oneShot = SpanDedup.clean(rows.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .select($"doc_id", $"n_spans", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)),
      rows.map(Seq(_)))
    for (s <- splits)
      assert(result(run(writeBatches(s))) === oneShot,
        s"split of sizes ${s.map(_.size)} diverged from one-shot clean")
  }

  test("a NEW stream lineage continues against the accumulated registry") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    // lineage 1: docs 1-2; lineage 2 (fresh source AND checkpoint, so
    // its batch ids restart at 0): docs 3-5 — doc 3 repeats doc 1's
    // spans and must still lose them, which requires the second lineage
    // to SEE the first lineage's registry rows
    run(writeBatches(Seq(rows.take(2))), cleaned, registry,
      ckpt = tmpDir("ssp-lin1"))
    run(writeBatches(Seq(rows.drop(2))), cleaned, registry,
      ckpt = tmpDir("ssp-lin2"))
    val oneShot = SpanDedup.clean(rows.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .select($"doc_id", $"n_spans", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(result(cleaned) === oneShot,
      "the second lineage must dedup against the first lineage's registry")
  }

  test("replay after a committed registry append is idempotent") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    val srcDir = writeBatches(Seq(rows))
    val ckpt = tmpDir("ssp-ckpt-replay")
    run(srcDir, cleaned, registry, ckpt)
    val before = result(cleaned)
    assert(registry.read().count() > 0, "registry must have been seeded")
    // crash simulation: the registry append committed but the
    // foreachBatch checkpoint commit didn't — delete the checkpoint's
    // last commit marker so the engine RE-DELIVERS the final batch with
    // the same lineage and batch id; the (lineage, batch_id) filter
    // must hide the batch's own spans from its replay
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc")) // checksum
      // sidecar: left stale it fails the re-commit's atomic rename
    run(srcDir, cleaned, registry, ckpt)
    assert(result(cleaned) === before,
      "replay must not dedup the batch against its own registry rows")
  }
}
