package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.{CompareTables, Workload}
import graft.sink.{KeyedLakeTable, LakeTableSpec}

class SourcesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("JDBC round-trip preserves a table exactly (embedded Derby)") {
    val log = Workload.generate(seed = 51, n = 150)
    val df = Workload.expectedTxnState(log).toDF()
    val url = JdbcTableSource.derbyUrl(tmpDir("derby-rt") + "/db")
    JdbcTableSource.write(df, url, "transactions")
    val back = JdbcTableSource.read(spark, url, "transactions")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("source-vs-lake oracle over a real JDBC source (compare.py flow)") {
    // generate → JDBC "RDS" holds final state → CDC log replayed into the
    // lake → the two must compare equal (the reference's continuous proof).
    val log = Workload.generate(seed = 53, n = 400)
    val url = JdbcTableSource.derbyUrl(tmpDir("derby-cmp") + "/db")
    JdbcTableSource.write(Workload.expectedTxnState(log).toDF(), url, "transactions")

    val lake = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("lake-cmp"), recordKeys = Seq("id"), precombine = "update_at",
      partitionSource = "create_at"))
    log.txns.grouped(150).zipWithIndex.foreach { case (b, i) =>
      if (i == 0) lake.overwrite(b.toDF()) else lake.upsert(b.toDF())
    }

    val source = JdbcTableSource.readOrdered(spark, url, "transactions")
    val diff = CompareTables.compare(source, lake.read())
    assert(diff.isEqual, s"diff: $diff")
  }

  test("partitioned JDBC read returns the same rows as the single-cursor read") {
    val df = (1L to 500L).map(i => (i, s"name-$i")).toDF("id", "payload")
    val url = JdbcTableSource.derbyUrl(tmpDir("derby-part") + "/db")
    JdbcTableSource.write(df, url, "t")
    val part = JdbcTableSource.read(spark, url, "t",
      partitionOn = Some(("id", 1L, 501L, 7)))
    assert(part.rdd.getNumPartitions === 7)
    assert(part.exceptAll(df).isEmpty && df.exceptAll(part).isEmpty)
  }

  test("gzip attribute-tagged export round-trips through the flattening scan") {
    val ev = Seq((1L, 10L, "click", 1.25), (2L, 11L, "view", -3.5))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = tmpDir("export-rt")
    DynamoExportSource.writeCompacted(ev,
      Seq("event_id", "user_id", "event_type", "value"), out)
    val gz = new java.io.File(out).listFiles().map(_.getPath)
      .filter(_.endsWith(".gz")).toSeq
    assert(gz.size === 1, "compacting sink must emit exactly one gzip file")
    val back = DynamoExportSource.readExport(spark, gz, Seq(
      ("event_id", "S", LongType), ("user_id", "S", LongType),
      ("event_type", "S", StringType), ("value", "S", DoubleType)))
    assert(back.orderBy("event_id").collect().toSeq ===
      ev.orderBy("event_id").collect().toSeq)
  }

  test("manifest scan parses summary and data-file list") {
    val dir = tmpDir("manifest")
    Files.writeString(Paths.get(dir, "manifest-summary.json"),
      """{"exportTime":"2024-01-01T00:00:00.000Z","itemCount":7269,"outputFormat":"DYNAMODB_JSON"}""")
    Files.writeString(Paths.get(dir, "manifest-files.json"),
      """{"dataFileS3Key":"data/a.json.gz","itemCount":100,"md5Checksum":"aaa"}
        |{"dataFileS3Key":"data/b.json.gz","itemCount":50,"md5Checksum":"bbb"}""".stripMargin)
    val summary = DynamoExportSource.readManifestSummary(
      spark, s"$dir/manifest-summary.json")
    assert(summary === DynamoExportSource.ManifestSummary(
      "2024-01-01T00:00:00.000Z", 7269L, "DYNAMODB_JSON"))
    val files = DynamoExportSource.readManifestFiles(
      spark, s"$dir/manifest-files.json")
    assert(files.map(_.dataFileS3Key).sorted === Seq("data/a.json.gz", "data/b.json.gz"))
    assert(files.map(_.itemCount).sum === 150L)
  }
}
