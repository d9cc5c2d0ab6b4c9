package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Sampling
import graft.streaming.CdcStreamIngest
import graft.text.TextOps

/** The curation stages are stateless codegen'd projections/filters, so
  * they must compose unchanged with Structured Streaming: a streamed
  * corpus sampled + redacted micro-batch by micro-batch yields exactly
  * the batch-mode result — the property that lets one curation pipeline
  * serve both the backfill and the live tail. */
class CurateStreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streamed sample+redact equals the batch result, across micro-batches") {
    val srcDir = tmpDir("curate-src")
    val ckpt = tmpDir("curate-ckpt")
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, s"doc body $i mail user$i@example.com end")).toDF("doc_id", "text")
    def curate(df: org.apache.spark.sql.DataFrame) =
      Sampling.sample(df, col("doc_id"), 0.4)
        .select(col("doc_id"), TextOps.redact(col("text")).as("clean"))

    // two arrivals = two micro-batches through one checkpoint
    mk(0 until 300).coalesce(1).write.mode("append").parquet(srcDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val schema = mk(0 until 1).schema
    def drain(): Unit = CdcStreamIngest.runCollect(
      curate(spark.readStream.schema(schema).parquet(srcDir)), ckpt) { rows =>
      got ++= rows.map(r => (r.getLong(0), r.getString(1)))
    }
    drain()
    mk(300 until 500).coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val want = curate(mk(0 until 500))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet === want, "stream picks/redactions must equal batch")
    assert(got.size === got.toSet.size, "no row is emitted twice across batches")
    assert(want.nonEmpty && want.size < 500, "sampling really filtered")
    assert(want.forall(_._2.contains("<EMAIL>")), "redaction ran in-stream")
  }
}
