package graft.sink

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.Workload

class VersionedLakeTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(): VersionedLakeTable =
    new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("vlake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def state(df: DataFrame): Set[Workload.Txn] =
    LakeOps.normalizeForCompare(df).as[Workload.Txn].collect().toSet

  /** Expected latest-wins state after the first `k` batches. */
  private def expectedAfter(log: Workload.Log, batchSize: Int, k: Int) =
    Workload.expectedTxnState(
      Workload.Log(log.accounts,
        log.txns.take(k * batchSize))).toSet

  test("every commit stays readable at its own version (time travel)") {
    val log = Workload.generate(seed = 31, n = 300)
    val table = newTable()
    val batches = log.txns.grouped(100).toSeq
    val vs = batches.map(b => table.upsert(b.toDF()))
    assert(vs === Seq(0, 1, 2))
    assert(table.versions === Seq(0, 1, 2))
    (1 to 3).foreach { k =>
      assert(state(table.read(Some(k - 1))) === expectedAfter(log, 100, k),
        s"snapshot ${k - 1}")
    }
    // default read = latest
    assert(state(table.read()) === expectedAfter(log, 100, 3))
    // SQL surface: a snapshot registers as a queryable view (AS OF analog)
    table.registerAs("txns_v0", Some(0))
    table.registerAs("txns_latest")
    assert(spark.sql("SELECT COUNT(*) FROM txns_v0").head().getLong(0) ===
      expectedAfter(log, 100, 1).size.toLong)
    assert(spark.sql("SELECT COUNT(*) FROM txns_latest").head().getLong(0) ===
      expectedAfter(log, 100, 3).size.toLong)
  }

  test("a merge writes only touched partitions; old files are shared forward") {
    val log = Workload.generate(seed = 32, n = 200)
    val table = newTable()
    table.upsert(log.txns.take(100).toDF())
    table.upsert(log.txns.drop(100).toDF())
    // v1's manifest must still reference at least one v0 data file IF some
    // partition was untouched by batch 2; at minimum, no old file was
    // deleted or rewritten in place
    val v0files = new java.io.File(table.spec.path + "/data/0")
    assert(v0files.exists, "v0 data dir must survive the second commit")
  }

  test("rollback restores an old snapshot as a new commit") {
    val log = Workload.generate(seed = 33, n = 200)
    val table = newTable()
    table.upsert(log.txns.take(100).toDF())
    table.upsert(log.txns.drop(100).toDF())
    val v = table.rollback(0)
    assert(v === 2)
    assert(state(table.read()) === expectedAfter(log, 100, 1))
    // the rolled-back-over commit is still in history
    assert(state(table.read(Some(1))) === expectedAfter(log, 100, 2))
  }

  test("vacuum drops old snapshots and their exclusive files, keeps the rest") {
    val log = Workload.generate(seed = 34, n = 300)
    val table = newTable()
    log.txns.grouped(100).foreach(b => table.upsert(b.toDF()))
    val before = state(table.read())
    val deleted = table.vacuumBefore(2)
    // versions 0 and 1 are gone…
    assert(table.versions === Seq(2))
    intercept[IllegalArgumentException](table.read(Some(0)))
    // …but the latest snapshot is fully intact, including v0 files it
    // still references (shared-forward files must NOT be deleted)
    assert(state(table.read()) === before)
    // batches re-touch partitions, so replaced files must have died
    assert(deleted > 0)
    intercept[IllegalArgumentException](table.vacuumBefore(99))
  }

  test("readWhere prunes at the manifest: only kept partitions' files are scanned") {
    val log = Workload.generate(seed = 37, n = 300)
    val table = newTable()
    log.txns.grouped(150).foreach(b => table.upsert(b.toDF()))
    val minutes = table.read().select($"create_minute").distinct()
      .as[String].collect().sorted
    assert(minutes.length > 1)
    val pick = minutes.head
    val pruned = table.readWhere(None, p => p("create_minute") == pick)
    // row-correct vs the post-scan filter…
    val expected = state(table.read().filter($"create_minute" === pick))
    assert(state(pruned) === expected)
    // …and the SCAN itself only lists the kept partition's files: every
    // input file path carries the picked minute dir
    val inputs = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator).mkString("\n")
    val scanned = pruned.inputFiles
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains(s"create_minute=$pick")),
      s"scan listed foreign partitions:\n${scanned.mkString("\n")}\n$inputs")
    // a predicate that prunes everything fails loudly, not silently-empty
    intercept[IllegalArgumentException](
      table.readWhere(None, _ => false))
  }

  test("compactSnapshot collapses the snapshot to one version dir, state intact") {
    val log = Workload.generate(seed = 36, n = 300)
    val table = newTable()
    log.txns.grouped(100).foreach(b => table.upsert(b.toDF()))
    val before = state(table.read())
    val v = table.compactSnapshot()
    assert(v === 3)
    assert(state(table.read()) === before)
    // the compacted snapshot references ONLY data/3 files
    val manifestText = java.nio.file.Files.readString(
      java.nio.file.Paths.get(table.spec.path, "_commits", "00000003.json"))
    assert(!manifestText.contains("data/0/") &&
      !manifestText.contains("data/1/") && !manifestText.contains("data/2/"))
    // vacuum after compaction reclaims every superseded file, table intact
    val deleted = table.vacuumBefore(3)
    assert(deleted > 0)
    assert(state(table.read()) === before)
  }

  test("empty batch commits nothing; bootstrap requires rows") {
    val table = newTable()
    intercept[IllegalStateException](
      table.upsert(Seq.empty[Workload.Txn].toDF()))
    val log = Workload.generate(seed = 35, n = 60)
    table.upsert(log.txns.toDF())
    val v = table.upsert(Seq.empty[Workload.Txn].toDF())
    assert(v === 0) // no new version for an empty batch
    assert(table.versions === Seq(0))
  }
}
