package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.LakeOps
import graft.sink.KeyedLakeTable

/** S7/K3/§2.8 — the streaming ingest variant: the reference's Lambda stream
  * consumer (micro-batches of ≤100 records / 10 s,
  * `lambda_functions/dynamodb_stream_consumer.py:8-9,31-90`) re-expressed as
  * Structured Streaming.
  *
  * Two modes, mirroring the two things the consumer does:
  *  - [[toLakeTable]]: stream → foreachBatch → keyed upsert merge. The merge
  *    is idempotent and precombine-guarded, so replayed or out-of-order
  *    micro-batches are safe (a late old `update_at` never clobbers a newer
  *    row — `incremental.py:225-226` semantics);
  *  - [[toPartitionedJson]]: stream → derive event-time minute partitions →
  *    partitioned JSON-lines files (K3, `dynamodb_stream_consumer.py:61-90`),
  *    i.e. the landing-zone writer the batch pipeline later consumes.
  */
object CdcStreamIngest {

  /** File-based CDC stream source. `maxFilesPerTrigger` is the micro-batch
    * bound (the reference's 100-records/10-s window analog). */
  def fileStream(spark: SparkSession, sourceDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 2): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

  /** Drain the stream into a keyed lake table via per-micro-batch upsert.
    * `Trigger.AvailableNow` processes the current backlog in bounded
    * micro-batches and stops — deterministic for tests/harness; a live
    * deployment would pass a processing-time trigger. */
  def toLakeTable(stream: DataFrame, table: KeyedLakeTable,
      checkpointDir: String): Unit = {
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) table.upsert(batch)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** K3 — partitioned JSON-lines landing sink: bucket records by event-time
    * minute (P6, `dynamodb_stream_consumer.py:61-81`) and append one
    * JSON-lines file set per partition per micro-batch. */
  def toPartitionedJson(stream: DataFrame, tsCol: String, outDir: String,
      checkpointDir: String): Unit = {
    val query = LakeOps.derivePartitionColumns(
        stream.withColumn("__iso", date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss")),
        "__iso")
      .drop("__iso")
      .writeStream
      .format("json")
      .partitionBy(LakeOps.partitionCols: _*)
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
