package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.PageRank
import graft.sink.{KeyedLakeTable, LakeTableSpec}

/** Contract of [[CdcStreamIngest.toPagerankTable]] — streaming PageRank
  * maintenance:
  *  1. after the stream drains, the ranks table is BIT-equal to the
  *     one-shot batch operator over the union of all edge batches,
  *     under ANY micro-batch split (split-invariance — the recompute
  *     reads only the accumulated edge table, never batch history);
  *  2. duplicate edges — within a batch, across batches, or via replay —
  *     collapse in the (src, dst)-keyed upsert and never distort
  *     outdegrees;
  *  3. the edge table accumulates (edges from early batches participate
  *     in later recomputes — verified by a node whose rank can only be
  *     correct if cross-batch edges are present).
  */
class StreamingPagerankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T0 = "2000-01-01T00:00:00.000000+0000"

  // a small digraph with a dangling node (d receives but never emits)
  // and a 2-cycle, so both the dangling and propagation paths matter
  private def edges: Seq[(String, String)] = Seq(
    ("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
    ("b", "d"), ("e", "a"), ("e", "d"))

  private def df(es: Seq[(String, String)]): DataFrame =
    es.toDF("src", "dst")
      .withColumn("create_at", lit(T0))
      .withColumn("update_at", lit(T0))

  private def writeBatches(batches: Seq[Seq[(String, String)]]): String = {
    val srcDir = tmpDir("spr-src")
    batches.zipWithIndex.foreach { case (b, i) =>
      val stage = tmpDir(s"spr-stage$i")
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

  private def run(srcDir: String): KeyedLakeTable = {
    val edgeTable = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("spr-edges"), recordKeys = Seq("src", "dst"),
      precombine = "update_at", partitionSource = "create_at"))
    val ranksTable = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("spr-ranks"), recordKeys = Seq("node"),
      precombine = "update_at", partitionSource = "create_at"))
    CdcStreamIngest.toPagerankTable(
      spark.readStream.schema(df(edges).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      edgeTable, ranksTable, iters = 5, tmpDir("spr-ckpt"))
    ranksTable
  }

  private def ranksOf(t: KeyedLakeTable): Map[String, Long] =
    t.read().select(col("node"), col("rank")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val batchRanks: Map[String, Long] =
    PageRank.run(df(edges), iters = 5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("3-way split equals the one-shot batch operator bit-for-bit") {
    val got = ranksOf(run(writeBatches(Seq(
      edges.take(3), edges.slice(3, 5), edges.drop(5)))))
    assert(got === batchRanks)
  }

  test("2-way split equals the 3-way split (split-invariance)") {
    val got = ranksOf(run(writeBatches(Seq(edges.take(5), edges.drop(5)))))
    assert(got === batchRanks)
  }

  test("duplicate edges across batches collapse in the keyed upsert") {
    // batch 2 re-sends two edges from batch 1 — outdegrees must not
    // double-count them
    val got = ranksOf(run(writeBatches(Seq(
      edges.take(4), edges.take(2) ++ edges.drop(4)))))
    assert(got === batchRanks)
  }
}
