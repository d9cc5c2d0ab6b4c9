package graft
import org.apache.spark.sql.SparkSession
/** Scratch diagnostic: print analyzed/optimized Catalyst trees for the
  * named queries (`graft.TreeDump q75_scale100_pricing ...`) so plan
  * rewrites can be written against the exact Spark 4.1 node shapes. */
object TreeDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, d).queryExecution
      println(s"===== $name ANALYZED =====")
      println(qe.analyzed.treeString)
      println(s"===== $name OPTIMIZED =====")
      println(qe.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
