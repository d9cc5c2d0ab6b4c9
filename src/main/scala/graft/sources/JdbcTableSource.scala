package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S4 — JDBC table scan/sink: the oracle side of the source-vs-lake compare
  * reads the relational source directly (`rds_to_datalake/compare.py:17-27`:
  * full table `ORDER BY id`). Local/test deployments use embedded Derby
  * (shipped with Spark); a real deployment points the URL at Postgres.
  */
object JdbcTableSource {

  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Full-table read. For large tables pass `partitionOn` + bounds so the
    * scan issues `numPartitions` parallel range queries instead of one
    * driver-throttled cursor — at scale a single JDBC cursor is the
    * bottleneck, not Spark. */
  def read(spark: SparkSession, url: String, table: String,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    partitionOn match {
      case Some((col, lower, upper, n)) => base
        .option("partitionColumn", col)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
        .load()
      case None => base.load()
    }
  }

  /** Ordered oracle read (`compare.py:24`). */
  def readOrdered(spark: SparkSession, url: String, table: String): DataFrame =
    read(spark, url, table).orderBy("id")

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(mode)
      .save()
}
