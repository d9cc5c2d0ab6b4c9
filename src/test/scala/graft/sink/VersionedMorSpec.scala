package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.Workload

class VersionedMorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(checkpointEvery: Int = 10, bloomBits: Int = 0) =
    new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("vmor"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")),
      checkpointEvery = checkpointEvery,
      statsCols = if (bloomBits > 0) Seq("amount") else Nil,
      keyBloomBits = bloomBits)

  private def state(df: DataFrame): Set[Workload.Txn] =
    LakeOps.normalizeForCompare(df).as[Workload.Txn].collect().toSet

  private def expectedAfter(log: Workload.Log, batchSize: Int, k: Int) =
    Workload.expectedTxnState(Workload.Log(log.accounts,
      log.txns.take(k * batchSize))).toSet

  test("append commits reach the eager merge state, with time travel at " +
      "every version") {
    val log = Workload.generate(seed = 81, n = 400)
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    val eager = newTable()
    val mor = newTable()
    batches.foreach(eager.upsert(_))
    val vs = batches.map(mor.upsertDeferred)
    assert(vs === Seq(0, 1, 2, 3))
    assert(state(mor.read()) === state(eager.read()))
    (1 to 4).foreach { k =>
      assert(state(mor.read(Some(k - 1))) === expectedAfter(log, 100, k),
        s"snapshot ${k - 1}")
    }
  }

  test("eager merges over an append chain fold their touched partitions; " +
      "compaction folds everything and restores pruning") {
    val log = Workload.generate(seed = 82, n = 300)
    val t = newTable(bloomBits = 1 << 12)
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    t.upsertDeferred(batches(0))
    t.upsertDeferred(batches(1))
    t.upsert(batches(2)) // eager on top of appends
    val expect = expectedAfter(log, 100, 3)
    assert(state(t.read()) === expect)
    // file-level stats pruning refuses while appends are in the chain
    val e = intercept[IllegalArgumentException] {
      t.readWhereStats(None, keepFile =
        FileStatsIndex.range("amount", Some(0), Some(10))).collect()
    }
    assert(e.getMessage.contains("key-complete"))
    // ... but the Bloom lookup composes (key-complete) and dedups
    val id = log.txns.head.id
    val hit = t.lookupKeys(Seq(Seq(id))).select("id").as[String].collect()
    assert(hit.toSeq === Seq(id), "one winning row per looked-up key")
    // countRows degrades to the exact dedup scan
    assert(t.countRows() === expect.size.toLong)
    // compaction folds the versions: pruning works again, counts are
    // O(metadata) again, state unchanged
    t.compactSnapshot()
    assert(state(t.read()) === expect)
    t.readWhereStats(None, keepFile =
      FileStatsIndex.range("amount", Some(0), Some(10))).collect()
    assert(t.countRows() === expect.size.toLong)
  }

  test("a cadence checkpoint through appends keeps every version file " +
      "and readers keep deduping above it") {
    val log = Workload.generate(seed = 83, n = 500)
    val t = newTable(checkpointEvery = 2)
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    batches.foreach(t.upsertDeferred(_)) // v2 and v4 are checkpoints
    (1 to 5).foreach { k =>
      assert(state(t.read(Some(k - 1))) === expectedAfter(log, 100, k),
        s"snapshot ${k - 1}")
    }
  }

  test("appendChainLength counts through cadence checkpoints and only a " +
      "compaction resets it") {
    val log = Workload.generate(seed = 87, n = 500)
    val t = newTable(checkpointEvery = 2)
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    t.upsertDeferred(batches(0)) // v0 bootstrap (eager full, non-append)
    assert(t.appendChainLength() === 0)
    batches.tail.zipWithIndex.foreach { case (b, i) =>
      t.upsertDeferred(b)
      // v2 and v4 are append-flagged FULL checkpoints — they shorten the
      // resolve chain but fold nothing, so the gauge must keep counting
      assert(t.appendChainLength() === i + 1,
        s"gauge after append commit v${i + 1}")
    }
    t.compactSnapshot()
    assert(t.appendChainLength() === 0, "compaction folds the chain")
    assert(state(t.read()) === expectedAfter(log, 100, 5))
  }

  test("vacuum over an append chain keeps superseded-version files that " +
      "kept snapshots still reference") {
    val log = Workload.generate(seed = 84, n = 300)
    val t = newTable()
    log.txns.grouped(100).foreach(b => t.upsertDeferred(b.toDF()))
    t.vacuumBefore(keepFrom = 1)
    // v1 resolves through v0's appended files: they must survive
    assert(state(t.read(Some(1))) === expectedAfter(log, 100, 2))
    assert(state(t.read()) === expectedAfter(log, 100, 3))
  }

  test("rollback onto an appended snapshot keeps the dedup semantics") {
    val log = Workload.generate(seed = 85, n = 300)
    val t = newTable()
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    batches.foreach(t.upsertDeferred(_))
    t.rollback(1)
    assert(state(t.read()) === expectedAfter(log, 100, 2))
  }

  private def morTxn(key: String, minute: Int, at: Int, amount: Int) =
    Workload.Txn(key, "a1", f"2024-01-01T00:$minute%02d:01.000000+0000",
      f"2024-01-01T00:$minute%02d:0$at.000000+0000", "fuel", amount, 0, "v")

  test("two interleaved APPENDs to the SAME partition both commit and " +
      "read equals the sequential result") {
    val path = tmpDir("vmor_occ_commute")
    def mk() = new VersionedLakeTable(spark, LakeTableSpec(
      path = path, recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")))
    val a = mk()
    val b = mk()
    a.upsertDeferred(Seq(morTxn("x", 1, 1, 10)).toDF()) // v0 bootstrap
    // A stages an append to minute 01; in its claim window B COMMITS an
    // append to the same partition — appends commute, so A walks past and
    // both land instead of A aborting stale
    a.onBeforeClaim = () =>
      assert(b.upsertDeferred(
        Seq(morTxn("x", 1, 2, 11), morTxn("y", 1, 1, 20)).toDF()) === 1)
    val v = try a.upsertDeferred(Seq(morTxn("x", 1, 3, 12)).toDF())
    finally a.onBeforeClaim = () => ()
    assert(v === 2, "A claims the slot above B's interleaved append")
    val head = a.read().select($"id", $"amount")
      .as[(String, Int)].collect().toMap
    assert(head === Map("x" -> 12, "y" -> 20),
      "read-side dedup must equal the sequential apply order")
    // time travel coherent: v1 sees B's append but not A's
    val atV1 = a.read(Some(1)).select($"id", $"amount")
      .as[(String, Int)].collect().toMap
    assert(atV1 === Map("x" -> 11, "y" -> 20))
  }

  test("mixed eager/append overlap still aborts in BOTH directions") {
    val path = tmpDir("vmor_occ_mixed")
    def mk() = new VersionedLakeTable(spark, LakeTableSpec(
      path = path, recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")))
    val a = mk()
    val b = mk()
    a.upsert(Seq(morTxn("x", 1, 1, 10)).toDF()) // v0
    // eager A walking past B's committed APPEND on the same partition:
    // A's delta would REPLACE the partition and drop B's append files
    a.onBeforeClaim = () =>
      { b.upsertDeferred(Seq(morTxn("x", 1, 2, 11)).toDF()); () }
    try intercept[java.util.ConcurrentModificationException] {
      a.upsert(Seq(morTxn("x", 1, 3, 12)).toDF())
    } finally a.onBeforeClaim = () => ()
    // append A walking past B's committed EAGER merge on the same
    // partition: conservative abort (the eager side of the pair already
    // rewrote the partition A declared)
    a.onBeforeClaim = () =>
      { b.upsert(Seq(morTxn("x", 1, 4, 13)).toDF()); () }
    try intercept[java.util.ConcurrentModificationException] {
      a.upsertDeferred(Seq(morTxn("x", 1, 5, 14)).toDF())
    } finally a.onBeforeClaim = () => ()
    // the table is intact and the surviving commits are readable
    assert(a.read().select($"amount").as[Int].collect().toSet === Set(13))
  }

  test("deferred commits need a tieBreak, loudly") {
    val noTie = new VersionedLakeTable(spark, LakeTableSpec(
      path = tmpDir("vmor_notie"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))
    val log = Workload.generate(seed = 86, n = 50)
    val e = intercept[IllegalArgumentException](
      noTie.upsertDeferred(log.txns.toDF()))
    assert(e.getMessage.contains("tieBreak"))
  }
}
