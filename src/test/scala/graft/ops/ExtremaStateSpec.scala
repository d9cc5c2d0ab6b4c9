package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Workload
import graft.sink.{KeyedLakeTable, LakeTableSpec}

/** Bounded incremental MIN/MAX: exactness against brute force wherever the
  * operator CLAIMS exactness, detected (never silent) staleness when
  * retractions drain a truncated buffer, and targeted repair restoring
  * exactness — across append-only, adversarial-displacement and random
  * churn feeds, including keys migrating between groups. */
class ExtremaStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("extrema-lake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def txn(id: String, at: Int, entity: String, amount: Int) =
    Workload.Txn(id, "a1", "2024-01-01T00:01:01.000000+0000",
      f"2024-01-01T00:01:${at % 60}%02d.${at}%06d+0000", entity, amount, 0, "v")

  private def brute(table: KeyedLakeTable): Map[String, (Double, Double)] =
    table.read().groupBy($"entity")
      .agg(min($"amount").cast("double"), max($"amount").cast("double"))
      .as[(String, Double, Double)].collect()
      .map { case (g, mn, mx) => g -> (mn, mx) }.toMap

  private def readState(state: DataFrame)
      : Map[String, (Option[Double], Boolean, Option[Double], Boolean)] =
    ExtremaState.extrema(state)
      .as[(String, Option[Double], Boolean, Option[Double], Boolean)]
      .collect()
      .map { case (g, mx, mxe, mn, mne) => g -> (mx, mxe, mn, mne) }.toMap

  test("append-only feed: always exact, equal to brute-force min/max") {
    val table = newTable()
    var state = ExtremaState.emptyState(spark)
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { b =>
      val rows = (0 until 40).map(i =>
        txn(s"k$b-$i", 1, s"g${rnd.nextInt(3)}", rnd.nextInt(1000)))
      val changes = table.upsertChanges(rows.toDF())
      state = ExtremaState.applyDelta(state, changes, "entity", "amount", 4)
        .localCheckpoint(true)
    }
    val got = readState(state)
    val want = brute(table)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, (mx, mxe, mn, mne)) =>
      assert(mxe && mne, s"append-only must stay exact for $g")
      assert(mx.contains(want(g)._2) && mn.contains(want(g)._1), s"group $g")
    }
  }

  test("adversarial displacement drains the buffer: staleness is DETECTED " +
    "and repair restores exactness") {
    val table = newTable()
    var state = ExtremaState.emptyState(spark)
    // ten values 100..109 in one group, k=2: buffer holds {108,109},
    // watermark 107 after truncation
    val boot = (0 until 10).map(i => txn(s"k$i", 1, "g", 100 + i))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(boot.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    assert(readState(state)("g")._1.contains(109.0))
    // displace BOTH buffered maxima below the watermark
    val displace = Seq(txn("k9", 2, "g", 0), txn("k8", 2, "g", 1))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(displace.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    val (mx, mxExact, mn, mnExact) = readState(state)("g")
    assert(!mxExact, "a drained truncated max side must flag inexact")
    assert(mnExact && mn.contains(0.0), "min side gained values, stays exact")
    // the true max (107, now the highest survivor) is in the truncated
    // region — repair rebuilds only this group from the base table
    val repaired = ExtremaState.repair(state, table.read(),
      $"entity", $"amount", 2)
    val after = readState(repaired)("g")
    assert(after._2 && after._1.contains(107.0), s"repair must restore: $after")
    assert(after._4 && after._3.contains(0.0))
  }

  test("random churn with group migration: exact claims always match " +
    "brute force; repair closes every gap") {
    val table = newTable()
    var state = ExtremaState.emptyState(spark)
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { b =>
      val rows = (0 until 60).map { _ =>
        val key = s"k${rnd.nextInt(25)}"
        txn(key, b, s"g${rnd.nextInt(3)}", rnd.nextInt(40))
      }
      // one batch may carry several versions of a key: keep the newest
      // (the change feed is per-batch latest-wins already; dedup inputs)
      val batch = rows.groupBy(_.id).map(_._2.last).toSeq
      val changes = table.upsertChanges(batch.toDF())
      state = ExtremaState.applyDelta(state, changes, "entity", "amount", 3)
        .localCheckpoint(true)
      val want = brute(table)
      val got = readState(state)
      assert(got.keySet == want.keySet,
        s"batch $b: live groups ${want.keySet} vs state ${got.keySet}")
      got.foreach { case (g, (mx, mxe, mn, mne)) =>
        if (mxe) assert(mx.contains(want(g)._2), s"batch $b group $g max")
        if (mne) assert(mn.contains(want(g)._1), s"batch $b group $g min")
      }
      state = ExtremaState.repair(state, table.read(),
        $"entity", $"amount", 3).localCheckpoint(true)
      val fixed = readState(state)
      fixed.foreach { case (g, (mx, mxe, mn, mne)) =>
        assert(mxe && mne, s"batch $b post-repair $g must be exact")
        assert(mx.contains(want(g)._2) && mn.contains(want(g)._1),
          s"batch $b post-repair $g values")
      }
    }
  }

  test("a stale NULL group is repaired like any other (null-safe joins)") {
    val table = newTable()
    var state = ExtremaState.emptyState(spark)
    val boot = (0 until 10).map(i => txn(s"k$i", 1, null, 100 + i))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(boot.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    val displace = Seq(txn("k9", 2, null, 0), txn("k8", 2, null, 1))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(displace.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    val pre = ExtremaState.extrema(state)
      .filter($"group".isNull).collect()
    assert(pre.length == 1 && !pre.head.getBoolean(2),
      s"null group must be flagged stale before repair: ${pre.toSeq}")
    val repaired = ExtremaState.repair(state, table.read(),
      $"entity", $"amount", 2)
    val after = ExtremaState.extrema(repaired)
      .filter($"group".isNull)
      .as[(Option[String], Option[Double], Boolean, Option[Double], Boolean)]
      .collect()
    assert(after.length == 1, s"exactly one null-group row: ${after.toSeq}")
    val (_, mx, mxe, mn, mne) = after.head
    assert(mxe && mx.contains(107.0), s"repair must fix the null group: $mx")
    assert(mne && mn.contains(0.0))
  }

  test("large-group guard: forced-low distinctCap output is identical to " +
    "the unguarded path") {
    val table = newTable()
    var state = ExtremaState.emptyState(spark)
    // 300 distinct values in one group, k=2 — with distinctCap forced to
    // its floor (10*(k+1) = 30 < 300) the quantile pre-filter arms; the
    // default cap leaves the path unguarded. Outputs must match exactly.
    val boot = (0 until 300).map(i => txn(s"k$i", 1, "g", i))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(boot.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    val displace = Seq(txn("k299", 2, "g", -5), txn("k298", 2, "g", -6))
    state = ExtremaState.applyDelta(state,
      table.upsertChanges(displace.toDF()), "entity", "amount", 2)
      .localCheckpoint(true)
    assert(!readState(state)("g")._2, "max side must be stale")
    def rows(cap: Long) =
      ExtremaState.repair(state, table.read(), $"entity", $"amount", 2, cap)
        .orderBy($"group")
        .collect().map(_.toString).toSeq
    val guarded = rows(30L)
    val plain = rows(4L * 1000 * 1000)
    assert(guarded == plain,
      s"guarded repair must equal unguarded:\n$guarded\nvs\n$plain")
    val after = ExtremaState.extrema(
      ExtremaState.repair(state, table.read(), $"entity", $"amount", 2, 30L))
    val g = after.filter($"group" === "g")
      .as[(String, Option[Double], Boolean, Option[Double], Boolean)]
      .collect().head
    assert(g._3 && g._2.contains(297.0), s"true max after displacement: $g")
  }

  test("precision guard: a BIGINT beyond 2^53 raises instead of silently " +
    "collapsing in double space") {
    def feed(v: Long) = spark.range(1).select(
      lit("insert").as("change_type"),
      struct(lit("g").as("entity"), lit(v).as("amount")).as("new_image"),
      struct(lit("g").as("entity"), lit(v).as("amount")).as("old_image"))
    // exactly representable: fine
    val ok = ExtremaState.applyDelta(
      ExtremaState.emptyState(spark), feed(1L << 53), "entity", "amount", 2)
    assert(ok.count() == 1)
    // one past the significand: loud failure, not a wrong extremum
    val e = intercept[Exception] {
      ExtremaState.applyDelta(ExtremaState.emptyState(spark),
        feed((1L << 53) + 1L), "entity", "amount", 2).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("does not fit a double exactly"),
      s"unexpected: $e")
  }
}
