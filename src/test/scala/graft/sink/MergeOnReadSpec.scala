package graft.sink

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.LakeOps
import graft.oracle.Workload

private[sink] case class MorRow(id: String, create_at: String,
    update_at: String, value: Long, seq: Long, is_deleted: Boolean)

class MergeOnReadSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(tag: String, softDelete: Boolean = false) =
    new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir(s"mor_$tag"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("seq"),
      softDeleteCol = if (softDelete) Some("is_deleted") else None))

  private def state(df: DataFrame): Set[Workload.Txn] =
    LakeOps.normalizeForCompare(df).as[Workload.Txn].collect().toSet

  test("deferred appends + merged read equal the eager merge exactly") {
    val log = Workload.generate(seed = 71, n = 400)
    val batches = log.txns.grouped(100).toSeq.map(_.toDF())
    val eager = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("mor_eager"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")))
    val mor = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("mor_lazy"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")))
    batches.foreach(eager.upsert(_))
    batches.foreach(mor.upsertDeferred)
    assert(state(mor.readMerged()) === state(eager.read()))
    // mixing modes is fine: an eager merge over the appended versions
    // still converges (latest-wins is idempotent)
    mor.upsert(batches.last)
    assert(state(mor.readMerged()) === state(eager.read()))
  }

  test("compaction folds versions to one winner per key and plain read agrees") {
    val log = Workload.generate(seed = 72, n = 300)
    val t = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("mor_compact"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("note")))
    log.txns.grouped(100).foreach(b => t.upsertDeferred(b.toDF()))
    val merged = state(t.readMerged())
    val rawBefore = t.read().count()
    t.compactMerged()
    assert(t.read().count() < rawBefore,
      "compaction must drop superseded versions")
    assert(state(t.read()) === merged, "plain read of the compacted table")
    assert(state(t.readMerged()) === merged, "readMerged stays safe after")
  }

  test("soft deletes ride deferred appends; resurrection respects order") {
    def r(id: String, v: Int, value: Long, dead: Boolean = false) =
      MorRow(id, "2024-01-01 00:00:00.000000",
        f"2024-01-01 00:00:0$v%d.000000", value, v.toLong, dead)
    val t = newTable("soft", softDelete = true)
    t.upsertDeferred(Seq(r("a", 1, 10), r("b", 1, 20)).toDF())
    t.upsertDeferred(Seq(r("a", 2, 10, dead = true), r("b", 2, 21)).toDF())
    t.upsertDeferred(Seq(r("a", 3, 12)).toDF()) // resurrect
    val live = t.readLiveMerged().select("id", "value")
      .as[(String, Long)].collect().toMap
    assert(live === Map("a" -> 12L, "b" -> 21L))
    // an out-of-order OLDER live version must not resurrect a newer delete
    t.upsertDeferred(Seq(r("b", 3, 99, dead = true)).toDF())
    t.upsertDeferred(Seq(r("b", 2, 21)).toDF()) // stale replay
    assert(t.readLiveMerged().filter($"id" === "b").count() === 0)
  }

  test("upsertChanges after deferred appends emits ONE change row per key") {
    def r(id: String, v: Int, value: Long) =
      MorRow(id, "2024-01-01 00:00:00.000000",
        f"2024-01-01 00:00:0$v%d.000000", value, v.toLong, false)
    val t = newTable("feed")
    // three accumulated versions of `a` in the raw files
    t.upsertDeferred(Seq(r("a", 1, 10), r("b", 1, 20)).toDF())
    t.upsertDeferred(Seq(r("a", 2, 11)).toDF())
    t.upsertDeferred(Seq(r("a", 3, 12)).toDF())
    val feed = t.upsertChanges(Seq(r("a", 4, 13), r("c", 1, 30)).toDF())
    val byKey = feed.groupBy("id").count()
      .as[(String, Long)].collect().toMap
    assert(byKey === Map("a" -> 1L, "c" -> 1L),
      "one change row per key, not one per accumulated stale version")
    val aRow = feed.filter($"id" === "a").collect().head
    assert(aRow.getAs[String]("change_type") === "update")
    assert(aRow.getAs[org.apache.spark.sql.Row]("old_image")
      .getAs[Long]("value") === 12L,
      "old image must be the LATEST accumulated version, not a stale one")
    assert(feed.filter($"id" === "c")
      .collect().head.getAs[String]("change_type") === "insert")
  }

  test("deferred mode guards loudly") {
    val noTie = new KeyedLakeTable(spark, LakeTableSpec(
      tmpDir("mor_notie"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))
    val rows = Seq(MorRow("a", "2024-01-01 00:00:00.000000",
      "2024-01-01 00:00:01.000000", 1, 1, false)).toDF()
    val e1 = intercept[IllegalArgumentException](noTie.upsertDeferred(rows))
    assert(e1.getMessage.contains("tieBreak"))
    val t = newTable("schema", softDelete = true)
    t.upsertDeferred(rows)
    val e2 = intercept[IllegalArgumentException](
      t.upsertDeferred(rows.withColumnRenamed("value", "amount")))
    assert(e2.getMessage.contains("schema mismatch"))
  }
}
