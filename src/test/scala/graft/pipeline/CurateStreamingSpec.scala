package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.curate.Sampling
import graft.streaming.CdcStreamIngest
import graft.text.{Repetition, TextOps}

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

  test("per-doc repetition metrics stream batch-by-batch identically") {
    // Repetition.metrics aggregates WITHIN a document, and a document is
    // one row — so running it per micro-batch (foreachBatch) is exactly
    // batch semantics, no cross-batch state. (Corpus-GLOBAL stages —
    // SpanDedup, NgramLM — deliberately do NOT have this property: their
    // streaming form is the incremental-dedup path, not foreachBatch.)
    val srcDir = tmpDir("rep-src")
    val ckpt = tmpDir("rep-ckpt")
    def mk(ids: Range) = ids.map(i =>
      (i.toLong, if (i % 3 == 0) "spam spam spam spam"
                 // long all-distinct text: top bigram share 1/26 < 0.05
                 else (0 until 27).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    mk(0 until 120).coalesce(1).write.mode("append").parquet(srcDir)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val schema = mk(0 until 1).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= Repetition.metrics(b, "doc_id", "text")
            .select("doc_id", "keep").collect()
            .map(r => (r.getLong(0), r.getBoolean(1)))
          ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    mk(120 until 200).coalesce(1).write.mode("append").parquet(srcDir)
    drain()

    val want = Repetition.metrics(mk(0 until 200), "doc_id", "text")
      .select("doc_id", "keep").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(got.toSet === want, "streamed metrics must equal batch metrics")
    assert(got.size === 200 && got.toSet.size === 200)
    assert(got.toSet.exists(!_._2) && got.toSet.exists(_._2),
      "the verdict split must survive the streaming path")
  }
}
