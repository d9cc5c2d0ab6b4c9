package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sink.{KeyedLakeTable, LakeTableSpec, VersionedLakeTable}
import graft.text.LineClean

/** Contract of [[CdcStreamIngest.toLineDedupTable]] — streaming
  * corpus-global line dedup with retroactive correction:
  *  1. the LIVE table state equals the one-shot
  *     [[LineClean.dropRepeatedLines]] under ANY micro-batch split AND
  *     any arrival ORDER (the drop rule is corpus-symmetric — no
  *     first-occurrence privilege, unlike the span/near-dup heads);
  *  2. retroactivity works through the lake's own semantics: a document
  *     emitted clean is RE-CLEANED by upsert when a later batch makes
  *     one of its lines hot, and tombstoned (soft delete) when its
  *     every line goes hot;
  *  3. replaying a batch whose registry append committed but whose
  *     checkpoint didn't reproduces the same state ((lineage, batch_id)
  *     registry guard);
  *  4. a NEW stream lineage continues against the accumulated registry.
  */
class StreamingLineDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // maxDocs = 2. "nav bar" goes hot at doc 3 (retro re-clean of doc 1);
  // "only line" goes hot at doc 5 (retro TOMBSTONE of doc 4).
  private def rows: Seq[(Long, String)] = Seq(
    (1L, "nav bar\nunique one"),
    (2L, "unique two\nbody text two"),
    (3L, "nav bar\nunique three"),
    (4L, "only line"),
    (5L, "only line\nextra five"))

  private def df(rs: Seq[(Long, String)]): DataFrame =
    rs.toDF("doc_id", "text")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(Long, String)]]): String = {
    val srcDir = tmpDir("sld-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"sld-stage$i")
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
      tmpDir("sld-clean"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at",
      softDeleteCol = Some("_gone")))

  private def newRegistry(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      tmpDir("sld-reg"), recordKeys = Seq("doc_id", "pos"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("batch_id")))

  private def run(srcDir: String, cleaned: KeyedLakeTable = newCleaned(),
      registry: VersionedLakeTable = newRegistry(),
      ckpt: String = tmpDir("sld-ckpt")): KeyedLakeTable = {
    CdcStreamIngest.toLineDedupTable(
      spark.readStream.schema(df(rows).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      "doc_id", "text", maxDocs = 2, cleaned, registry, ckpt)
    cleaned
  }

  private def live(t: KeyedLakeTable): Seq[(Long, String)] =
    t.readLive().select($"doc_id", $"text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  private def oneShot(rs: Seq[(Long, String)]): Seq[(Long, String)] =
    LineClean.dropRepeatedLines(rs.toDF("doc_id", "text"),
        "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("any split equals the one-shot dropRepeatedLines") {
    val expect = oneShot(rows)
    assert(expect.map(_._1) === Seq(1L, 2L, 3L, 5L),
      "fixture must exercise both the re-clean and the tombstone")
    val splits = Seq(
      Seq(rows),
      Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)),
      rows.map(Seq(_)))
    for (s <- splits)
      assert(live(run(writeBatches(s))) === expect,
        s"split of sizes ${s.map(_.size)} diverged from one-shot")
  }

  test("arrival ORDER does not matter (corpus-symmetric rule)") {
    assert(live(run(writeBatches(rows.reverse.map(Seq(_))))) ===
      oneShot(rows))
  }

  test("retroactive re-clean and tombstone actually happen late") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    // first stream: docs 1-4 only — doc 1 still carries "nav bar"? No:
    // doc 3 arrives in this window, so doc 1 is already re-cleaned; but
    // doc 4 is LIVE ("only line" seen once)
    run(writeBatches(Seq(rows.take(4))), cleaned, registry,
      ckpt = tmpDir("sld-lin1"))
    assert(live(cleaned).contains((4L, "only line")),
      "doc 4 must be live before its line goes hot")
    // second lineage delivers doc 5: "only line" crosses the threshold —
    // doc 4 must be TOMBSTONED and doc 5 kept without the hot line
    run(writeBatches(Seq(rows.drop(4))), cleaned, registry,
      ckpt = tmpDir("sld-lin2"))
    val l = live(cleaned)
    assert(!l.exists(_._1 == 4L), "doc 4 must be tombstoned retroactively")
    assert(l.contains((5L, "extra five")))
    assert(l === oneShot(rows),
      "cross-lineage continuation must land on the one-shot state")
  }

  test("replay after a committed registry append is idempotent") {
    val cleaned = newCleaned()
    val registry = newRegistry()
    val srcDir = writeBatches(Seq(rows.take(3), rows.drop(3)))
    val ckpt = tmpDir("sld-ckpt-replay")
    run(srcDir, cleaned, registry, ckpt)
    val before = live(cleaned)
    assert(registry.read().count() > 0, "registry must have been seeded")
    val commits = Paths.get(ckpt, "commits")
    val last = Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit))
      .map(_.toInt).max
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc"))
    run(srcDir, cleaned, registry, ckpt)
    assert(live(cleaned) === before,
      "replay must not count the batch's own crashed append as history")
  }

  test("cleaned table without softDeleteCol is rejected loudly") {
    val bad = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("sld-bad"), recordKeys = Seq("doc_id"),
      precombine = "update_at", partitionSource = "create_at"))
    val e = intercept[IllegalArgumentException] {
      CdcStreamIngest.toLineDedupTable(
        spark.readStream.schema(df(rows).schema).parquet(tmpDir("sld-x")),
        "doc_id", "text", 2, bad, newRegistry(), tmpDir("sld-ck"))
    }
    assert(e.getMessage.contains("softDeleteCol"))
  }
}
