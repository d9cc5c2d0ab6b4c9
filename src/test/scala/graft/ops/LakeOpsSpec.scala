package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Workload

class LakeOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("derivePartitionColumns slices the exact reference positions") {
    // initial_load.py:129-150: (1,4) (6,2) (9,2) (12,2) (15,2)
    val df = Seq("2023-07-30T16:49:36.444736+0000", "2024-01-02 03:04:05")
      .toDF("create_at")
    val rows = LakeOps.derivePartitionColumns(df).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
    assert(rows(0) === (("2023", "07", "30", "16", "49")))
    assert(rows(1) === (("2024", "01", "02", "03", "04")))
  }

  test("latestWinsDedup keeps exactly the greatest precombine row per key") {
    val df = Seq(
      ("a", "2024-01-01T00:00:01.000000+0000", "v1"),
      ("a", "2024-01-01T00:00:03.000000+0000", "v3"),
      ("a", "2024-01-01T00:00:02.000000+0000", "v2"),
      ("b", "2024-01-01T00:00:01.000000+0000", "w1"))
      .toDF("id", "update_at", "note")
    val out = LakeOps.latestWinsDedup(df, Seq("id"), "update_at")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out === Set(("a", "v3"), ("b", "w1")))
  }

  test("latestWinsDedup is idempotent") {
    val log = Workload.generate(seed = 11, n = 300)
    val df = log.txns.toDF()
    val once = LakeOps.latestWinsDedup(df, Seq("id"), "update_at")
    val twice = LakeOps.latestWinsDedup(once, Seq("id"), "update_at")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("latestWinsDedup equals the source-of-truth last-writer state") {
    val log = Workload.generate(seed = 23, n = 500)
    val deduped = LakeOps.latestWinsDedup(log.txns.toDF(), Seq("id"), "update_at")
      .as[Workload.Txn].collect().toSet
    assert(deduped === Workload.expectedTxnState(log).toSet)
  }

  test("latestWinsDedup tieBreak makes equal-precombine merges deterministic") {
    val ts = "2024-01-01T00:00:01.000000+0000"
    val df = Seq(("a", ts, 1L, "low"), ("a", ts, 2L, "high"))
      .toDF("id", "update_at", "seq", "note")
    val out = LakeOps.latestWinsDedup(df, Seq("id"), "update_at",
      tieBreak = Seq(col("seq").desc))
    assert(out.collect().map(_.getString(3)).toSeq === Seq("high"))
  }

  test("salted dedup equals plain dedup (skew path is semantics-free)") {
    val log = Workload.generate(seed = 71, n = 400)
    val df = log.txns.toDF()
    val plain = LakeOps.latestWinsDedup(df, Seq("id"), "update_at")
    val salted = LakeOps.latestWinsDedupSalted(df, Seq("id"), "update_at")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.columns.toSeq === df.columns.toSeq)
  }

  test("salted dedup equals plain dedup on a hot-key batch (50% one key)") {
    // the q66 distribution in miniature: half the rows share one key, a
    // total tie-break order makes both paths' argmax fully deterministic
    val df = (0 until 20000).map { i =>
      val key = if (i % 2 == 0) -1L else i.toLong % 97
      (key, (i * 2654435761L) % 1000003, i.toLong)
    }.toDF("id", "pre", "seq").repartition(16)
    val plain = LakeOps.latestWinsDedup(df, Seq("id"), "pre",
      tieBreak = Seq(col("seq").desc))
    val salted = LakeOps.latestWinsDedupSalted(df, Seq("id"), "pre",
      tieBreakCols = Seq("seq"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // phase 1 really spreads the hot key: per-(key,salt) groups stay small
    val maxGroup = df.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("pre"), col("seq")),
        org.apache.spark.sql.functions.lit(16)))
      .groupBy("id", "__salt").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxGroup <= 10000 / 16 + 200,
      s"salt failed to spread the hot key: max group $maxGroup")
  }

  test("dropOp and normalizeForCompare strip helper/meta/partition columns") {
    val df = Seq(("a", "2024-01-01T00:00:01.000000+0000", "U"))
      .toDF("id", "create_at", "Op")
    val lake = LakeOps.derivePartitionColumns(LakeOps.dropOp(df))
      .withColumn("_hoodie_commit_time", lit("x"))
    val normalized = LakeOps.normalizeForCompare(lake)
    assert(normalized.columns.toSeq === Seq("id", "create_at"))
  }
}
