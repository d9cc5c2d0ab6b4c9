package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S5/S6/P4/K4 — the snapshot-export ingest path: point-in-time exports land
  * as manifested gzip JSON-lines files of attribute-tagged items
  * (`vendor/aws_dynamodb_export_to_s3.py:32-100,319-375`;
  * `…post_processor_worker.py:27-67`; `README.rst:131-154`).
  */
object DynamoExportSource {

  /** `manifest-summary.json` fields the pipeline consumes
    * (`vendor/aws_dynamodb_export_to_s3.py:32-61`). */
  final case class ManifestSummary(
      exportTime: String, itemCount: Long, outputFormat: String)

  /** One data-file entry of `manifest-files.json`
    * (`vendor/aws_dynamodb_export_to_s3.py:67-76`). */
  final case class DataFile(dataFileS3Key: String, itemCount: Long, md5Checksum: String)

  /** S6 — manifest scan: parse the summary document. */
  def readManifestSummary(spark: SparkSession, path: String): ManifestSummary = {
    val row = spark.read.json(path)
      .select(col("exportTime"), col("itemCount"), col("outputFormat"))
      .head()
    ManifestSummary(row.getString(0), row.getLong(1), row.getString(2))
  }

  /** S6 — manifest scan: the data-file list (collected to the driver — it
    * is a file LIST, bounded by file count, and the read planner needs it
    * driver-side anyway). */
  def readManifestFiles(spark: SparkSession, path: String): Seq[DataFile] =
    spark.read.json(path)
      .select(col("dataFileS3Key"), col("itemCount"), col("md5Checksum"))
      .collect()
      .map(r => DataFile(r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq

  /** Attribute-tag decoder (P4): `{"S": "x"}` / `{"N": "123"}` unions →
    * plain typed columns (`…post_processor_worker.py:39-56`,
    * `dynamodb_stream_consumer.py:42-59`). `attrs` maps output column name
    * to ("S"|"N", target Spark type). */
  def flattenItem(item: Column, attrs: Seq[(String, String, DataType)]): Seq[Column] =
    attrs.map { case (name, tag, dt) =>
      item.getField(name).getField(tag).cast(dt).as(name)
    }

  /** S5 + P4 — read gzip JSON-lines export data files (gzip is transparent
    * to the text/json source) and flatten the attribute-tagged `Item`
    * envelope into a plain DataFrame. */
  def readExport(spark: SparkSession, files: Seq[String],
      attrs: Seq[(String, String, DataType)]): DataFrame = {
    val itemSchema = StructType(attrs.map { case (name, tag, _) =>
      StructField(name, StructType(Seq(StructField(tag, StringType))))
    })
    val schema = StructType(Seq(StructField("Item", itemSchema)))
    spark.read.schema(schema).json(files: _*)
      .select(flattenItem(col("Item"), attrs): _*)
  }

  /** K4 — gzip JSON-lines compacting sink: the worker concatenates ≤100
    * input files into one compressed output (`…post_processor_worker.py:58-67`).
    * Expressed as a coalesced compressed write — one output file per call. */
  def writeCompacted(df: DataFrame, itemCols: Seq[String], outDir: String): Unit = {
    val tagged = struct(itemCols.map(c =>
      struct(col(c).cast("string").as("S")).as(c)): _*)
    df.select(to_json(struct(tagged.as("Item"))).as("value"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .text(outDir)
  }
}
