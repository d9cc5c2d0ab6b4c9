package graft.sink

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.Workload

class CompactionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val partCols = LakeOps.partitionCols

  /** An append-only landing zone fragmented by many micro-batch appends —
    * each batch drops one file into every partition it touches (the K3
    * landing-sink pattern; the upsert sink never fragments because each
    * merge rewrites its touched partitions whole). */
  private def landingZone(seed: Int, n: Int, batches: Int): String = {
    val log = Workload.generate(seed = seed, n = n)
    val dir = tmpDir("landing")
    log.txns.grouped(math.max(1, n / batches)).foreach { b =>
      LakeOps.derivePartitionColumns(b.toDF(), "create_at")
        .coalesce(1).write.mode("append")
        .partitionBy(partCols: _*).parquet(dir)
    }
    dir
  }

  /** The zone's rows as a bag (id, update_at, note) — compaction must be
    * invisible to this regardless of file layout. */
  private def rows(dir: String): Map[(String, String, String), Long] =
    spark.read.parquet(dir).select($"id", $"update_at", $"note")
      .as[(String, String, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def leafFiles(root: java.io.File): Map[String, Long] = {
    def walk(f: java.io.File, depth: Int): Seq[(String, Long)] =
      if (depth == 0)
        f.listFiles().toSeq.filter(x => x.isFile &&
          !x.getName.startsWith("_") && !x.getName.startsWith("."))
          .map(x => (f.getPath + "/" + x.getName, x.lastModified()))
      else f.listFiles().toSeq.filter(d => d.isDirectory &&
        !d.getName.startsWith("_")).flatMap(walk(_, depth - 1))
    walk(root, partCols.length).toMap
  }

  test("compact reduces file count and preserves rows exactly") {
    val dir = landingZone(seed = 11, n = 600, batches = 6)
    val before = rows(dir)
    val nFilesBefore = leafFiles(new java.io.File(dir)).size
    val report = Compaction.compact(spark, dir, partCols)
    assert(report.partitionsCompacted > 0)
    assert(report.filesBefore === nFilesBefore.toLong)
    assert(report.filesAfter < report.filesBefore)
    // tiny partitions collapse to their byte-justified target: one file
    assert(report.filesAfter === report.partitionsScanned.toLong)
    assert(rows(dir) === before)
  }

  test("compact is idempotent: second run is a metadata-only no-op") {
    val dir = landingZone(seed = 12, n = 300, batches = 4)
    Compaction.compact(spark, dir, partCols)
    val again = Compaction.compact(spark, dir, partCols)
    assert(again.partitionsCompacted === 0)
    assert(again.filesBefore === again.filesAfter)
  }

  test("compact rewrites only over-target partitions; others survive on disk") {
    val dir = landingZone(seed = 13, n = 400, batches = 5)
    // make everything single-file, then re-fragment ONE partition with an
    // extra append into it
    Compaction.compact(spark, dir, partCols)
    val one = spark.read.parquet(dir).limit(1)
    LakeOps.derivePartitionColumns(
        one.drop(partCols: _*), "create_at")
      .coalesce(1).write.mode("append").partitionBy(partCols: _*).parquet(dir)
    val root = new java.io.File(dir)
    val beforeFiles = leafFiles(root)
    val before = rows(dir)
    val report = Compaction.compact(spark, dir, partCols)
    val afterFiles = leafFiles(root)
    assert(report.partitionsCompacted === 1)
    // untouched partitions' files survive byte-for-byte (same path + mtime)
    val survivors = beforeFiles.filter { case (k, _) => afterFiles.contains(k) }
    assert(survivors.size === beforeFiles.size - 2) // the 2 merged files go
    assert(survivors.forall { case (k, m) => afterFiles(k) == m })
    assert(rows(dir) === before)
  }

  test("expireBefore drops exactly the partitions below the cutoff") {
    val dir = landingZone(seed = 14, n = 500, batches = 3)
    val minutes = spark.read.parquet(dir).select($"create_minute")
      .distinct().as[String].collect().sorted
    assert(minutes.length > 2, "fixture must span several minute partitions")
    val cutoffMinute = minutes(minutes.length / 2)
    val expected = spark.read.parquet(dir)
      .filter($"create_minute" >= cutoffMinute)
      .select($"id", $"update_at").as[(String, String)].collect().toSet
    assert(expected.nonEmpty, "fixture must keep some partitions")
    val report = Compaction.expireBefore(spark, dir, partCols,
      Seq("2024", "01", "01", "00", cutoffMinute))
    assert(report.partitionsDropped === minutes.count(_ < cutoffMinute))
    val got = spark.read.parquet(dir)
      .select($"id", $"update_at").as[(String, String)].collect().toSet
    assert(got === expected)
  }

  test("expireBefore prefix cutoff prunes whole subtrees and empty parents") {
    val dir = landingZone(seed = 16, n = 200, batches = 2)
    // everything is January 2024 — a cutoff at Feb 2024 empties the zone
    // (all partitions drop, ancestor dirs pruned)
    val report = Compaction.expireBefore(spark, dir, partCols, Seq("2024", "02"))
    assert(report.partitionsDropped === report.partitionsScanned)
    assert(!new java.io.File(dir).listFiles().exists(_.isDirectory))
  }

  test("expireBefore validates its cutoff arity") {
    val dir = landingZone(seed = 15, n = 100, batches = 2)
    intercept[IllegalArgumentException] {
      Compaction.expireBefore(spark, dir, partCols, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Compaction.expireBefore(spark, dir, partCols,
        Seq.fill(partCols.length + 1)("x"))
    }
  }
}
