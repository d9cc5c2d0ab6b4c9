package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.Workload
import graft.sink.{KeyedLakeTable, LakeTableSpec}

class CdcStreamIngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streamed micro-batches reach the same table as one batch") {
    val log = Workload.generate(seed = 61, n = 300)
    val srcDir = tmpDir("stream-src")
    val df = log.txns.toDF()
    df.repartition(5).write.mode("overwrite").parquet(srcDir)
    val lake = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("stream-lake"), recordKeys = Seq("id"), precombine = "update_at",
      partitionSource = "create_at"))
    val stream = CdcStreamIngest.fileStream(spark, srcDir, df.schema,
      maxFilesPerTrigger = 2)
    CdcStreamIngest.toLakeTable(stream, lake, tmpDir("stream-ckpt"))
    val got = LakeOps.normalizeForCompare(lake.read())
      .as[Workload.Txn].collect().toSet
    assert(got === Workload.expectedTxnState(log).toSet)
  }

  test("a late stream file with older update_at does not clobber newer rows") {
    val t0 = "2024-01-01T00:00:01.000000+0000"
    val t1 = "2024-01-01T00:00:09.000000+0000"
    val srcDir = tmpDir("late-src")
    val ckpt = tmpDir("late-ckpt")
    val lake = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("late-lake"), recordKeys = Seq("id"), precombine = "update_at",
      partitionSource = "create_at"))
    val newer = Seq(Workload.Txn("k1", "a1", t0, t1, "fuel", 5, 0, "newer")).toDF()
    newer.write.mode("append").parquet(srcDir)
    val schema = newer.schema
    CdcStreamIngest.toLakeTable(
      CdcStreamIngest.fileStream(spark, srcDir, schema), lake, ckpt)
    // late arrival: an OLDER version of the same key lands after the fact
    Seq(Workload.Txn("k1", "a1", t0, t0, "fuel", 5, 0, "older-late")).toDF()
      .write.mode("append").parquet(srcDir)
    CdcStreamIngest.toLakeTable(
      CdcStreamIngest.fileStream(spark, srcDir, schema), lake, ckpt)
    assert(lake.read().select("note").as[String].collect().toSeq === Seq("newer"))
  }

  test("partitioned JSON-lines landing sink writes minute-partition dirs (K3)") {
    val srcDir = tmpDir("json-src")
    val outDir = tmpDir("json-out")
    val df = Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-01-01 10:15:30"), 1.0),
      ("e2", java.sql.Timestamp.valueOf("2024-01-01 10:16:45"), 2.0))
      .toDF("id", "event_ts", "value")
    df.write.mode("overwrite").parquet(srcDir)
    CdcStreamIngest.toPartitionedJson(
      CdcStreamIngest.fileStream(spark, srcDir, df.schema),
      "event_ts", outDir, tmpDir("json-ckpt"))
    val back = spark.read
      .option("basePath", outDir)
      .json(s"$outDir/create_year=2024/create_month=01/create_day=01/create_hour=10/*")
    assert(back.count() === 2)
    val minutes = back.select("create_minute").as[String].collect().toSet
    assert(minutes === Set("15", "16"))
  }
}
