package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chunked equals the global-window row numbering") {
    // skewed, shuffled order keys across several input partitions
    val ids = scala.util.Random.shuffle((1L to 5000L).map(_ * 3 + 7)).toSeq
    val df = ids.toDF("event_id").repartition(13)
    val got = CdcQueries.chunked(df, "event_id", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy(col("event_id"))
    val want = df.withColumn("chunk",
        ((row_number().over(w) - 1) / lit(100)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("chunked plan has no single-task global Window") {
    val df = (1L to 1000L).toDF("event_id")
    val plan = CdcQueries.chunked(df, "event_id", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window survived:\n$plan")
  }

  test("chunk sizes are exact and chunks are contiguous in key order") {
    val df = (1L to 1234L).toDF("event_id")
    val chunks = CdcQueries.chunked(df, "event_id", 100)
      .groupBy("chunk")
      .agg(count(lit(1)).as("n"), min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("chunk")
      .collect()
    assert(chunks.length === 13)
    assert(chunks.init.forall(_.getLong(1) === 100L) && chunks.last.getLong(1) === 34L)
    // chunk i's max key < chunk i+1's min key
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2))
    }
  }
}
