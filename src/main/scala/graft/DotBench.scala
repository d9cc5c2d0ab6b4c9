package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the vec_dot kernel: the native expression vs the
  * composed aggregate(zip_with(...)) higher-order form it replaced, on a
  * synthetic corpus sized like a real embedding table (default 200k
  * vectors × 256 dims — far bigger than the bench corpus, where the dot
  * product is not the bottleneck). Prints one JSON line. */
object DotBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 256
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(rows.toLong).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(col("id") * 31 + i.cast("long") * 7, lit(997)).cast("float") / 13.0f))
        .cast("array<float>").as("a"))
      .withColumn("b", transform(col("a"), x => x * 0.5f).cast("array<float>"))
      .localCheckpoint(true)
    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      // warmup + min of 3
      def once(): Double = {
        val t0 = System.nanoTime()
        df.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = (1 to 3).map(_ => once()).min
      println(f"""{"kernel":"$label","sec":$t%.3f,"rows":$rows,"dim":$dim}""")
      t
    }
    val hof = time("aggregate_zip_with",
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x))
    val native = time("vec_dot", expr("vec_dot(a, b)"))
    println(f"""{"speedup":${hof / native}%.2f}""")
    spark.stop()
  }
}
