package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — full-snapshot scan: the bootstrap load reads the `LOAD*` full-load
  * files a CDC extractor drops before streaming begins
  * (`glue_jobs/initial_load.py:95-121`: S3 listing with `start_after=LOAD`,
  * then an explicit file-list read). */
object SnapshotSource {

  /** List the `LOAD*.parquet` full-load files under a table directory. */
  def listLoadFiles(conf: Configuration, tableRoot: String): Seq[String] = {
    val root = new Path(tableRoot)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filter { p =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        name.startsWith("LOAD") && name.endsWith(".parquet")
      }
      .sorted
  }

  /** Read an explicit snapshot file list (S1/S2 both reduce to this). */
  def read(spark: SparkSession, files: Seq[String]): DataFrame =
    spark.read.parquet(files: _*)
}
