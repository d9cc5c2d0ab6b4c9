package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.oracle.Workload
import graft.sink.{KeyedLakeTable, LakeTableSpec}

/** DDSketch quantile maintenance: exact batching-invariance of the folded
  * state, retraction correctness (state == from-scratch build of the
  * latest-wins table after updates), the α relative-error guarantee at the
  * exact rank, and region coverage (negative / zero / positive values,
  * null groups, null measures). */
class QuantileStateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def newTable(): KeyedLakeTable =
    new KeyedLakeTable(spark, LakeTableSpec(
      path = tmpDir("qs-lake"), recordKeys = Seq("id"),
      precombine = "update_at", partitionSource = "create_at"))

  private def txn(id: String, at: Int, entity: String, amount: Int) =
    Workload.Txn(id, "a1", "2024-01-01T00:01:01.000000+0000",
      f"2024-01-01T00:01:${at % 60}%02d.${at}%06d+0000", entity, amount, 0, "v")

  private def stateRows(df: DataFrame): Set[(Option[String], Int, Int, Long)] =
    df.as[(Option[String], Int, Int, Long)].collect().toSet

  /** Replay `rows` through a fresh lake in `nb` batches, folding the
    * change feed into a quantile state. */
  private def fold(rows: Seq[Workload.Txn], nb: Int): DataFrame = {
    val table = newTable()
    var state = QuantileState.emptyState(spark)
    (0 until nb).foreach { b =>
      val batch = rows.zipWithIndex.filter(_._2 % nb == b).map(_._1)
      if (batch.nonEmpty) {
        val changes = table.upsertChanges(batch.toDF())
        state = QuantileState.applyDelta(state, changes, "entity", "amount")
          .localCheckpoint(true)
      }
    }
    state
  }

  test("the folded state is EXACTLY batching-invariant (3-way == 5-way == " +
    "one-shot) and equals a from-scratch build") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 200).map(i =>
      txn(s"k$i", 1, s"g${rnd.nextInt(3)}", rnd.nextInt(2000) - 500))
    val s3 = stateRows(fold(rows, 3))
    val s5 = stateRows(fold(rows, 5))
    val s1 = stateRows(fold(rows, 1))
    assert(s3 == s5 && s3 == s1, "any batching must yield the identical state")
    // and the fold equals a from-scratch sketch of the final table
    val table = newTable()
    rows.grouped(70).foreach(b => table.upsert(b.toDF()))
    val scratch = stateRows(QuantileState.batchState(
      table.read(), col("entity"), col("amount")))
    assert(s3 == scratch, "fold must equal from-scratch build")
  }

  test("retractions maintain the state through updates: fold == rebuild " +
    "of the latest-wins table, not of the raw stream") {
    val boot = (0 until 50).map(i => txn(s"k$i", 1, "g", 100 + i))
    // second wave rewrites half the keys to new values (some cross sign)
    val upd = (0 until 25).map(i => txn(s"k$i", 2, "g", -300 - i))
    val table = newTable()
    var state = QuantileState.emptyState(spark)
    Seq(boot, upd).foreach { b =>
      state = QuantileState.applyDelta(state,
        table.upsertChanges(b.toDF()), "entity", "amount")
        .localCheckpoint(true)
    }
    val scratch = stateRows(QuantileState.batchState(
      table.read(), col("entity"), col("amount")))
    assert(stateRows(state) == scratch)
    assert(state.agg(sum($"c")).head.getLong(0) == 50L,
      "updated keys must not double-count")
  }

  test("α guarantee: each quantile is within α·|x| of the value at the " +
    "exact rank, across negative/zero/positive regions") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      val v = rnd.nextInt(7) match {
        case 0 => 0
        case 1 | 2 => -(rnd.nextInt(100000) + 1)
        case _ => rnd.nextInt(1000000) + 1
      }
      txn(s"k$i", 1, s"g${i % 2}", v)
    }
    val state = fold(rows, 3)
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = QuantileState.quantiles(state, ps)
      .as[(String, Double, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    val byGroup = rows.groupBy(_.entity)
      .map { case (g, rs) => g -> rs.map(_.amount.toDouble).sorted }
    for (g <- byGroup.keys; p <- ps) {
      val xs = byGroup(g)
      val exact = xs(math.max(1, math.ceil(p * xs.length).toInt) - 1)
      val est = got((g, p))
      assert(math.abs(est - exact) <= 0.01 * math.abs(exact) + 1e-9,
        s"group $g p=$p exact=$exact est=$est")
    }
  }

  test("null measures are ignored; a null group is a group") {
    val changes = spark.range(1).select(
      lit("insert").as("change_type"),
      struct(lit(null.asInstanceOf[String]).as("entity"),
        lit(42.0).as("amount")).as("new_image"),
      struct(lit(null.asInstanceOf[String]).as("entity"),
        lit(0.0).as("amount")).as("old_image"))
      .unionByName(spark.range(1).select(
        lit("insert").as("change_type"),
        struct(lit("g").as("entity"),
          lit(null.asInstanceOf[java.lang.Double]).as("amount"))
          .as("new_image"),
        struct(lit("g").as("entity"),
          lit(null.asInstanceOf[java.lang.Double]).as("amount"))
          .as("old_image")))
    val state = QuantileState.applyDelta(
      QuantileState.emptyState(spark), changes, "entity", "amount")
    val rows = stateRows(state)
    assert(rows.size == 1 && rows.head._1.isEmpty,
      s"null group kept, null measure dropped: $rows")
    val q = QuantileState.quantiles(state, Seq(0.5))
      .select($"value").as[Double].collect()
    assert(q.length == 1 && math.abs(q.head - 42.0) <= 0.42 + 1e-9)
  }
}
