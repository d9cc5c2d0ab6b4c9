package graft.sink

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.{CompareTables, Workload}

class KeyedLakeTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(tieBreak: Seq[String] = Nil): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("lake-txn"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = tieBreak))

  private def asState(df: DataFrame): Set[Workload.Txn] =
    LakeOps.normalizeForCompare(df).as[Workload.Txn].collect().toSet

  test("overwrite bootstraps a partitioned keyed table") {
    val log = Workload.generate(seed = 1, n = 200)
    val table = newTable()
    table.overwrite(log.txns.toDF())
    assert(asState(table.read()) === Workload.expectedTxnState(log).toSet)
    // partition layout exists on disk (5-level hive-style dirs)
    val root = new java.io.File(table.spec.path)
    val yearDirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(yearDirs.exists(_.startsWith("create_year=")))
  }

  test("bootstrap + upserts == source-of-truth last-writer state") {
    val log = Workload.generate(seed = 2, n = 600)
    val batches = log.txns.grouped(200).toSeq
    val table = newTable()
    table.overwrite(batches.head.toDF())
    batches.tail.foreach(b => table.upsert(b.toDF()))
    assert(asState(table.read()) === Workload.expectedTxnState(log).toSet)
  }

  test("any batch split of the same log yields the same table") {
    val log = Workload.generate(seed = 3, n = 400)
    val splits = Seq(Seq(400), Seq(100, 300), Seq(150, 150, 100), Seq(47, 212, 90, 51))
    val states = splits.map { sizes =>
      assert(sizes.sum === 400)
      val table = newTable()
      var rest = log.txns
      var first = true
      sizes.foreach { k =>
        val (batch, r) = rest.splitAt(k)
        rest = r
        if (first) { table.overwrite(batch.toDF()); first = false }
        else table.upsert(batch.toDF())
      }
      asState(table.read())
    }
    assert(states.distinct.size === 1)
    assert(states.head === Workload.expectedTxnState(log).toSet)
  }

  test("a late batch with an older update_at never clobbers a newer row") {
    // incremental.py:225-226 semantics: precombine guards against
    // out-of-order application.
    val t0 = "2024-01-01T00:00:01.000000+0000"
    val t1 = "2024-01-01T00:00:05.000000+0000"
    val table = newTable()
    table.overwrite(Seq(
      Workload.Txn("k1", "a1", t0, t1, "fuel", 10, 0, "newer")).toDF())
    table.upsert(Seq(
      Workload.Txn("k1", "a1", t0, t0, "fuel", 10, 0, "older-late")).toDF())
    val note = table.read().select("note").as[String].collect().toSeq
    assert(note === Seq("newer"))
  }

  test("on an equal precombine value the incoming row wins (Hudi tie rule)") {
    val t0 = "2024-01-01T00:00:01.000000+0000"
    val t1 = "2024-01-01T00:00:05.000000+0000"
    val table = newTable()
    table.overwrite(Seq(
      Workload.Txn("k1", "a1", t0, t1, "fuel", 10, 0, "original")).toDF())
    table.upsert(Seq(
      Workload.Txn("k1", "a1", t0, t1, "fuel", 10, 0, "incoming")).toDF())
    val note = table.read().select("note").as[String].collect().toSeq
    assert(note === Seq("incoming"))
  }

  test("a configured tieBreak is a total order across batches, not arrival order") {
    // ADVICE r2: equal-precombine versions of one key split across batches
    // must resolve by the tieBreak column regardless of which batch arrived
    // first — otherwise batch-split invariance fails exactly when the
    // tieBreak exists to prevent it.
    val t0 = "2024-01-01T00:00:01.000000+0000"
    val hi = Workload.Txn("k1", "a1", t0, t0, "fuel", 99, 0, "tiebreak-high")
    val lo = Workload.Txn("k1", "a1", t0, t0, "fuel", 1, 0, "tiebreak-low")
    val notes = Seq(Seq(hi, lo), Seq(lo, hi)).map { case Seq(first, second) =>
      val table = newTable(tieBreak = Seq("amount"))
      table.overwrite(Seq(first).toDF())
      table.upsert(Seq(second).toDF())
      table.read().select("note").as[String].collect().toSeq
    }
    assert(notes === Seq(Seq("tiebreak-high"), Seq("tiebreak-high")))
  }

  test("upsert rewrites only the touched partitions") {
    val log = Workload.generate(seed = 5, n = 300)
    val table = newTable()
    table.overwrite(log.txns.toDF())
    val root = java.nio.file.Paths.get(table.spec.path)
    def fileMtimes(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = fileMtimes()
    Thread.sleep(20)
    // update one existing key only
    val one = log.txns.head
    table.upsert(Seq(one.copy(update_at = "2024-12-31T00:00:00.000000+0000",
      note = "touched")).toDF())
    val after = fileMtimes()
    val unchanged = before.keySet.intersect(after.keySet)
      .count(k => before(k) == after(k))
    // every partition except the touched one keeps its original files
    assert(unchanged > 0 && before.size - unchanged <= before.size / 2)
    // and the final state is still exact
    val expected = Workload.expectedTxnState(log).map(t =>
      if (t.id == one.id) t.copy(update_at = "2024-12-31T00:00:00.000000+0000", note = "touched") else t)
    assert(asState(table.read()) === expected.toSet)
  }

  test("a null partition source fails the batch loudly instead of corrupting") {
    val table = newTable()
    table.overwrite(Seq(
      Workload.Txn("k1", "a1", "2024-01-01T00:00:01.000000+0000",
        "2024-01-01T00:00:01.000000+0000", "fuel", 1, 0, "ok")).toDF())
    val bad = Seq(
      Workload.Txn("k2", "a1", null, "2024-01-01T00:00:02.000000+0000",
        "fuel", 1, 0, "null-create-at")).toDF()
    val e = intercept[Exception](table.upsert(bad))
    assert(e.getMessage.contains("null create_at") ||
      Option(e.getCause).exists(_.getMessage.contains("null create_at")))
    // table unchanged
    assert(table.read().count() === 1)
  }

  test("two partition values for one key in a batch are rejected (invariant)") {
    val table = newTable()
    table.overwrite(Seq(
      Workload.Txn("k1", "a1", "2024-01-01T00:00:01.000000+0000",
        "2024-01-01T00:00:01.000000+0000", "fuel", 1, 0, "ok")).toDF())
    val bad = Seq(
      Workload.Txn("k1", "a1", "2024-02-01T00:00:01.000000+0000",
        "2024-02-01T00:00:05.000000+0000", "fuel", 1, 0, "moved"),
      Workload.Txn("k1", "a1", "2024-03-01T00:00:01.000000+0000",
        "2024-03-01T00:00:06.000000+0000", "fuel", 1, 0, "moved-again")).toDF()
    val e = intercept[IllegalArgumentException](table.upsert(bad))
    // the error names the offending key (ADVICE r3: debuggable rejections)
    assert(e.getMessage.contains("id=k1"), e.getMessage)
  }

  test("an empty first batch is a no-op, not a poisoned table path") {
    val table = newTable()
    table.upsert(Seq.empty[Workload.Txn].toDF())
    assert(!table.exists)
    // the table still bootstraps fine afterwards
    val log = Workload.generate(seed = 91, n = 50)
    table.upsert(log.txns.toDF())
    assert(asState(table.read()) === Workload.expectedTxnState(log).toSet)
    // and an empty later batch changes nothing
    table.upsert(Seq.empty[Workload.Txn].toDF())
    assert(asState(table.read()) === Workload.expectedTxnState(log).toSet)
  }

  test("upsert into an empty path behaves as bootstrap") {
    val log = Workload.generate(seed = 7, n = 100)
    val table = newTable()
    table.upsert(log.txns.toDF())
    assert(asState(table.read()) === Workload.expectedTxnState(log).toSet)
  }

  test("CompareTables proves source == lake after a CDC run, and catches drift") {
    val log = Workload.generate(seed = 8, n = 500)
    val table = newTable()
    val batches = log.txns.grouped(120).toSeq
    table.overwrite(batches.head.toDF())
    batches.tail.foreach(b => table.upsert(b.toDF()))
    val source = Workload.expectedTxnState(log).toDF()
    val diff = CompareTables.compare(source, table.read())
    assert(diff.isEqual, s"diff: $diff")
    // and the oracle actually detects a corrupted lake
    val corrupted = table.read().limit(table.read().count().toInt - 1)
    assert(!CompareTables.compare(source, corrupted).isEqual)
  }

  test("strict upsert rejects a batch whose columns differ from the table's") {
    val log = Workload.generate(seed = 60, n = 120)
    val table = newTable()
    table.overwrite(log.txns.take(60).toDF())
    val extra = log.txns.drop(60).toDF()
      .withColumn("channel", org.apache.spark.sql.functions.lit("web"))
    val e = intercept[IllegalArgumentException](table.upsert(extra))
    assert(e.getMessage.contains("evolveSchema"), e.getMessage)
  }

  test("evolveSchema adds a batch-only column; old rows read it as null") {
    val log = Workload.generate(seed = 61, n = 200)
    val table = newTable()
    val (first, second) = log.txns.splitAt(100)
    table.overwrite(first.toDF())
    val evolved = second.toDF()
      .withColumn("channel", org.apache.spark.sql.functions.lit("web"))
    table.upsert(evolved, evolveSchema = true)
    val out = table.read()
    assert(out.columns.contains("channel"))
    val expected = Workload.expectedTxnState(log).toSet
    assert(asState(out.drop("channel")) === expected)
    // exactly the keys whose WINNING version came from the evolved batch
    // carry the channel value; everything else is null
    val secondIds = second.map(_.id).toSet
    val winners = expected.filter(t => secondIds.contains(t.id))
      .filter(t => second.exists(s => s.id == t.id && s.update_at == t.update_at))
      .map(_.id)
    val channelled = out.filter($"channel".isNotNull)
      .select($"id").as[String].collect().toSet
    assert(channelled === winners)
  }

  test("evolveSchema null-fills a batch missing a table column") {
    val log = Workload.generate(seed = 62, n = 150)
    val table = newTable()
    val (first, second) = log.txns.splitAt(100)
    table.overwrite(first.toDF())
    table.upsert(second.toDF().drop("note"), evolveSchema = true)
    val out = table.read()
    assert(out.columns.contains("note"))
    val expected = Workload.expectedTxnState(log).toSet
    // winners from the evolved batch have null note; the rest keep theirs
    val fromSecond = out.filter($"note".isNull).select($"id").as[String]
      .collect().toSet
    val secondWinners = expected
      .filter(t => second.exists(s => s.id == t.id && s.update_at == t.update_at))
      .map(_.id)
    assert(fromSecond === secondWinners)
    // data columns other than the evolved one are merge-correct
    val got = out.select($"id", $"update_at", $"amount")
      .as[(String, String, Int)].collect().toSet
    assert(got === expected.map(t => (t.id, t.update_at, t.amount)))
  }

  test("a same-name type change is always a loud error, even when evolving") {
    val log = Workload.generate(seed = 63, n = 80)
    val table = newTable()
    table.overwrite(log.txns.take(40).toDF())
    val retyped = log.txns.drop(40).toDF()
      .withColumn("amount", $"amount".cast("string"))
    val e1 = intercept[IllegalArgumentException](table.upsert(retyped))
    assert(e1.getMessage.contains("type changed"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      table.upsert(retyped, evolveSchema = true))
    assert(e2.getMessage.contains("type changed"), e2.getMessage)
  }

  test("soft delete: a tombstone wins only by precombine, an older version " +
    "cannot resurrect, the change feed classifies live transitions, and " +
    "incremental aggregates track the live table") {
    import org.apache.spark.sql.functions._
    val table = new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("lake-softdel"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      softDeleteCol = Some("is_deleted")))
    def txn(id: String, at: Int, amount: Int) = Workload.Txn(
      id, "a1", "2024-01-01T00:01:01.000000+0000",
      f"2024-01-01T00:0$at:00.000000+0000", "misc", amount, 0, "v")
    def batch(rows: Seq[Workload.Txn], deleted: Set[String]) =
      rows.toDF().withColumn("is_deleted",
        col("id").isin(deleted.toSeq: _*))
    var state = graft.ops.IncrementalAgg.emptyState(spark,
      org.apache.spark.sql.types.StringType)
    def fold(changes: DataFrame): Unit =
      state = graft.ops.IncrementalAgg.applyDelta(state, changes,
        "entity", "amount", softDeleteField = Some("is_deleted"))
        .localCheckpoint(true)

    // b1: four live rows at t=1
    val b1 = batch(Seq(txn("k1", 1, 10), txn("k2", 1, 20),
      txn("k3", 1, 30), txn("k4", 1, 40)), Set.empty)
    fold(table.upsertChanges(b1))
    // b2 at t=2: delete k1, update k2, delete never-seen k9,
    // and a STALE delete of k3 at t=0 (older than the live version)
    val b2 = batch(Seq(txn("k1", 2, 10), txn("k2", 2, 25),
      txn("k9", 2, 99), txn("k3", 0, 30)), Set("k1", "k9", "k3"))
    val feed2 = table.upsertChanges(b2)
    val types2 = feed2.select($"id", $"change_type")
      .as[(String, String)].collect().toMap
    assert(types2 == Map("k1" -> "delete", "k2" -> "update",
      "k9" -> "delete", "k3" -> "noop"), s"feed2: $types2")
    fold(feed2)
    assert(table.readLive().select($"id", $"amount")
      .as[(String, Int)].collect().toSet ==
      Set(("k2", 25), ("k3", 30), ("k4", 40)),
      "tombstones must leave the live read; a stale delete must not land")
    // b3 at t=3: resurrect k1; a LIVE version of k9 at t=0 must NOT
    // resurrect it (the tombstone is newer)
    val b3 = batch(Seq(txn("k1", 3, 11), txn("k9", 0, 99)), Set.empty)
    val feed3 = table.upsertChanges(b3)
    val types3 = feed3.select($"id", $"change_type")
      .as[(String, String)].collect().toMap
    assert(types3 == Map("k1" -> "insert", "k9" -> "noop"), s"feed3: $types3")
    fold(feed3)
    assert(table.readLive().select($"id", $"amount")
      .as[(String, Int)].collect().toSet ==
      Set(("k1", 11), ("k2", 25), ("k3", 30), ("k4", 40)))
    // the maintained aggregate equals a from-scratch aggregate of LIVE rows
    val live = table.readLive().groupBy($"entity")
      .agg(count(lit(1)).as("n"), sum($"amount").as("t"))
      .as[(String, Long, Long)].collect().map {
        case (g, n, t) => g -> (n, t) }.toMap
    val st = state.select($"group", $"n_rows", $"total".cast("long"))
      .as[(String, Long, Long)].collect().map {
        case (g, n, t) => g -> (n, t) }.toMap
    assert(st == live, s"state $st vs live $live")
    // the tombstone ROW is still in the raw table (resurrection guard)
    assert(table.read().filter($"id" === "k9" && $"is_deleted").count() == 1)
  }

  test("commit-marker read memo: any instance's write invalidates; " +
      "markerless tables never memoize") {
    val log = Workload.generate(seed = 77, n = 300)
    val batches = log.txns.grouped(150).toSeq
    val path = tmpDir("lake-memo")
    def instance() = new KeyedLakeTable(spark, LakeTableSpec(
      path = path, recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))
    val t1 = instance()
    t1.overwrite(batches(0).toDF())
    val marker = new java.io.File(path, "_graft_commit")
    assert(marker.isFile, "every write must leave the commit marker")
    val v1 = java.nio.file.Files.readString(marker.toPath)
    // memoize t1's resolved read, then write through a DIFFERENT instance
    val before = asState(t1.read())
    assert(before === Workload.expectedTxnState(
      Workload.Log(log.accounts, batches(0))).toSet)
    val t2 = instance()
    t2.upsert(batches(1).toDF())
    val v2 = java.nio.file.Files.readString(marker.toPath)
    assert(v2 !== v1, "a write must bump the marker value")
    // t1's next read must see t2's write (memo invalidated by version)
    assert(asState(t1.read()) === Workload.expectedTxnState(log).toSet)
    // legacy/foreign layout: no marker → reads stay correct (no memo)
    assert(marker.delete())
    assert(asState(t1.read()) === Workload.expectedTxnState(log).toSet)
  }
}
