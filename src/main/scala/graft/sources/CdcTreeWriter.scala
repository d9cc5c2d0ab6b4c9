package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TimeCodec

/** Harness-side builder of a time-keyed CDC file tree: splits a CDC stream
  * into commit-time buckets and writes each bucket as one parquet file
  * named by its commit-time upper bound — the exact layout a DMS-style
  * extractor produces (`DMS.rst:31-57`) and [[CdcFileSource]] plans over.
  *
  * This is test/replay infrastructure (the reference's counterpart is DMS
  * itself), so the per-bucket driver loop is fine: it builds fixtures, it is
  * not a data-path operator.
  */
object CdcTreeWriter {

  /** Write `df` into `tableRoot` as one file per `bucketUs`-sized window of
    * `tsUsCol` (epoch-micros long). Each file's name encodes max(ts)+1ms —
    * "all changes committed before this timestamp". Returns written paths. */
  def write(spark: SparkSession, df: DataFrame, tableRoot: String,
      tsUsCol: String, bucketUs: Long): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tableRoot).getFileSystem(conf)
    val buckets = df.select((col(tsUsCol) / lit(bucketUs)).cast("long").as("b"))
      .distinct().collect().map(_.getLong(0)).sorted
    buckets.map { b =>
      val sub = df.filter((col(tsUsCol) / lit(bucketUs)).cast("long") === b)
      val maxUs = sub.agg(max(col(tsUsCol))).head().getLong(0)
      val upper = TimeCodec.fromMicros(maxUs + 1000) // +1ms: strict upper bound
      val target = new Path(CdcFileSource.cdcFilePath(tableRoot, upper))
      val staging = new Path(tableRoot, s"_staging_$b")
      sub.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = fs.listStatus(staging).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $staging"))
      fs.mkdirs(target.getParent)
      fs.rename(part, target)
      fs.delete(staging, true)
      target.toString
    }.toSeq
  }

  /** Write `df` as the table's `LOAD*` full-load snapshot file
    * (`initial_load.py:95-107` listing contract). */
  def writeLoadFile(spark: SparkSession, df: DataFrame, tableRoot: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tableRoot).getFileSystem(conf)
    val staging = new Path(tableRoot, "_staging_load")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $staging"))
    val target = new Path(tableRoot, "LOAD00000001.parquet")
    fs.mkdirs(target.getParent)
    fs.rename(part, target)
    fs.delete(staging, true)
    target.toString
  }
}
