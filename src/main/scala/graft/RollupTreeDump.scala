package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch diagnostic: the exact Catalyst shape of a native rollup/cube
  * (Aggregate over Expand) in Spark 4.1, for the reagg rewrite rule. */
object RollupTreeDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("s"))
    println("===== ANALYZED =====")
    println(df.queryExecution.analyzed.treeString)
    println("===== OPTIMIZED =====")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
