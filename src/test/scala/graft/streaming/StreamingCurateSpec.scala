package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.{Dedup, SpanDedup}
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}

/** Contract of [[CdcStreamIngest.toCuratedTable]] — the composed
  * span-dedup → near-dup streaming curation pipeline:
  *  1. with ids MONOTONE in arrival order the curated table is INVARIANT
  *     under micro-batch boundaries AND equal to the one-shot
  *     composition `SpanDedup.clean` → `incrementalDedupSigs(empty,
  *     cleaned)` — each stage is individually split-invariant, so the
  *     chain is;
  *  2. replaying a batch whose registry appends committed but whose
  *     checkpoint didn't reproduces the same curated rows (both
  *     registries carry the batch-id guard).
  */
class StreamingCurateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // k = 2 spans; docs 3/4 repeat earlier spans (stage-1 work), and doc 5
  // carries doc 2's word stream OFFSET BY ONE ("x" prefix) — none of its
  // 2-word spans equals a prior span, so stage 1 keeps its text whole,
  // but its cleaned bigram shingles overlap doc 2's cleaned text at
  // J = 7/8: the near-dup only stage 2 can catch
  private def rows: Seq[(Long, String)] = Seq(
    (1L, "a b c d"),
    (2L, "p q r s t u v w"),
    (3L, "a b c d e f"),
    (4L, "c d x y"),
    (5L, "x p q r s t u v w"))

  private def df(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(Long, String)]]): String = {
    val srcDir = tmpDir("scur-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"scur-stage$i")
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

  private def newCurated(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("scur-cur"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def newSpanReg(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("scur-sreg"), recordKeys = Seq("h"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private def newDocReg(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("scur-dreg"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private val (k, n, b, r, tau) = (2, 2, 16, 8, 0.6)

  private def run(srcDir: String, curated: KeyedLakeTable = newCurated(),
      spanReg: VersionedLakeTable = newSpanReg(),
      docReg: VersionedLakeTable = newDocReg(),
      ckpt: String = tmpDir("scur-ckpt")): KeyedLakeTable = {
    CdcStreamIngest.toCuratedTable(
      spark.readStream.schema(df(rows).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", k, n, b, r, tau, curated, spanReg, docReg, ckpt)
    curated
  }

  private def result(t: KeyedLakeTable): Seq[(Long, Long, Long, String)] =
    t.read().select($"doc_id", $"n_spans", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  private def oneShot(): Seq[(Long, Long, Long, String)] = {
    val cleaned = SpanDedup.clean(rows.toDF("doc_id", "text"),
      "doc_id", "text", k)
    val kept = Dedup.incrementalDedupSigs(
      cleaned.select($"doc_id", $"clean_text".as("text"),
        lit(null).cast("array<bigint>").as("sig")).limit(0),
      cleaned.select($"doc_id", $"clean_text".as("text")),
      "doc_id", "text", n, b, r, tau).kept
    kept.select($"doc_id").join(cleaned, Seq("doc_id"))
      .select($"doc_id", $"n_spans", $"n_kept", $"clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
  }

  test("monotone-id stream: any split equals the one-shot composition") {
    val expected = oneShot()
    // fixture sanity: stage 2 must actually drop something (a doc whose
    // CLEANED text near-dups an earlier cleaned doc)
    assert(!expected.map(_._1).contains(5L),
      s"doc 5's cleaned text must near-dup doc 2's; got $expected")
    assert(expected.map(_._1).contains(2L))
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)),
      rows.map(Seq(_)))
    for (s <- splits)
      assert(result(run(writeBatches(s))) === expected,
        s"split of sizes ${s.map(_.size)} diverged from one-shot chain")
  }

  test("replay after committed registry appends is idempotent") {
    val curated = newCurated()
    val spanReg = newSpanReg()
    val docReg = newDocReg()
    val srcDir = writeBatches(Seq(rows))
    val ckpt = tmpDir("scur-ckpt-replay")
    run(srcDir, curated, spanReg, docReg, ckpt)
    val before = result(curated)
    assert(spanReg.read().count() > 0 && docReg.read().count() === rows.size.toLong)
    // crash simulation: both registry appends committed but the
    // foreachBatch checkpoint commit didn't — re-deliver the final
    // batch with the same lineage and batch id
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc")) // checksum
      // sidecar: left stale it fails the re-commit's atomic rename
    run(srcDir, curated, spanReg, docReg, ckpt)
    assert(result(curated) === before,
      "replay must not curate the batch against its own registry rows")
  }
}
