package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Workload
import graft.oracle.Workload.Txn
import graft.sink.{KeyedLakeTable, LakeTableSpec}

class IncrementalAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("ivm-lake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def t(i: Int) = f"2024-01-01T00:00:$i%02d.000000+0000"

  test("change feed classifies insert/update/noop and carries both images") {
    val table = newTable()
    val c1 = table.upsertChanges(Seq(
      Txn("k1", "a1", t(1), t(1), "grocery", 10, 0, "v1"),
      Txn("k2", "a1", t(1), t(1), "fuel", 5, 0, "v1")).toDF())
    val types1 = c1.select($"id", $"change_type").as[(String, String)]
      .collect().toMap
    assert(types1 === Map("k1" -> "insert", "k2" -> "insert"))
    assert(c1.filter($"old_image".isNotNull).count() === 0)

    // k1: strictly newer version, amount AND group (entity) change;
    // k3: brand-new key
    val c2 = table.upsertChanges(Seq(
      Txn("k1", "a1", t(1), t(3), "rent", 20, 0, "v2"),
      Txn("k3", "a1", t(2), t(2), "misc", 7, 0, "v1")).toDF())
    val byId = c2.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("k1").getString(1) === "update")
    assert(byId("k3").getString(1) === "insert")
    val old1 = byId("k1").getStruct(2)
    val new1 = byId("k1").getStruct(3)
    assert(old1.getAs[Int]("amount") === 10)
    assert(old1.getAs[String]("entity") === "grocery")
    assert(new1.getAs[Int]("amount") === 20)
    assert(new1.getAs[String]("entity") === "rent")

    // a STALE redelivery (t2 < current t3) must be a noop and not write
    val c3 = table.upsertChanges(Seq(
      Txn("k1", "a1", t(1), t(2), "rent", 99, 0, "stale")).toDF())
    assert(c3.select($"change_type").as[String].collect().toSeq === Seq("noop"))
    val amounts = table.read().filter($"id" === "k1")
      .select($"amount").as[Int].collect().toSeq
    assert(amounts === Seq(20))
  }

  test("changelog matches the merge on a full ordering tie with tieBreak") {
    // The merge's ordering ends with __src desc in BOTH tieBreak
    // configurations, so an exact (precombine, tieBreak) tie replaces the
    // table row with the incoming one. The changelog must say 'update' —
    // 'noop' would let IncrementalAgg state drift from the table when the
    // tied versions carry different payloads (ADVICE r7).
    val table = new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("ivm-tie"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at",
      tieBreak = Seq("amount")))
    table.upsert(Seq(Txn("k1", "a1", t(1), t(1), "fuel", 5, 0, "v1")).toDF())
    val c = table.upsertChanges(Seq(
      Txn("k1", "a1", t(1), t(1), "fuel", 5, 0, "v2-different-payload")).toDF())
    assert(c.select($"change_type").as[String].collect().toSeq === Seq("update"))
    // and the table really does hold the incoming payload
    assert(table.read().filter($"id" === "k1")
      .select($"note").as[String].collect().toSeq === Seq("v2-different-payload"))
  }

  test("a NULL grouping value merges with itself instead of accreting rows") {
    val table = newTable()
    var state = IncrementalAgg.emptyState(spark,
      org.apache.spark.sql.types.StringType)
    state = IncrementalAgg.applyDelta(state,
      table.upsertChanges(Seq(
        Txn("k1", "a1", t(1), t(1), null, 10, 0, "v1")).toDF()),
      "entity", "amount")
    state = IncrementalAgg.applyDelta(state,
      table.upsertChanges(Seq(
        Txn("k2", "a1", t(2), t(2), null, 7, 0, "v1")).toDF()),
      "entity", "amount")
    val rows = state.select($"group", $"n_rows",
      $"total".cast("double")).collect()
    assert(rows.length === 1, s"null group must merge, got ${rows.toSeq}")
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) === 2L &&
      rows.head.getDouble(2) === 17.0)
  }

  test("retraction stream moves a key's contribution between groups") {
    val table = newTable()
    var state = IncrementalAgg.emptyState(spark,
      org.apache.spark.sql.types.StringType)
    state = IncrementalAgg.applyDelta(state,
      table.upsertChanges(Seq(
        Txn("k1", "a1", t(1), t(1), "grocery", 10, 0, "v1")).toDF()),
      "entity", "amount")
    assert(state.select($"group", $"n_rows").as[(String, Long)]
      .collect().toSet === Set(("grocery", 1L)))
    // the key's only row moves wholesale to another group: the old group
    // must LEAVE the state (zero rows), not linger at zero/negative
    state = IncrementalAgg.applyDelta(state,
      table.upsertChanges(Seq(
        Txn("k1", "a1", t(1), t(2), "rent", 25, 0, "v2")).toDF()),
      "entity", "amount")
    val rows = state.select($"group", $"n_rows",
      $"total".cast("double")).as[(String, Long, Double)].collect().toSet
    assert(rows === Set(("rent", 1L, 25.0)))
  }

  test("incremental agg over many batches equals a from-scratch recompute") {
    val log = Workload.generate(seed = 77, n = 400)
    val table = newTable()
    var state = IncrementalAgg.emptyState(spark,
      org.apache.spark.sql.types.StringType)
    log.txns.grouped(100).foreach { b =>
      val changes = table.upsertChanges(b.toDF())
      state = IncrementalAgg.applyDelta(state, changes, "entity", "amount")
        .localCheckpoint(true)
    }
    val got = state
      .select($"group", $"n_rows", $"total".cast("double"))
      .as[(String, Long, Double)].collect().toSet
    val want = Workload.expectedTxnState(log).toDF()
      .groupBy($"entity")
      .agg(count(lit(1)).as("n"),
        sum($"amount".cast("decimal(20,2)")).cast("double").as("tot"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
  }
}
