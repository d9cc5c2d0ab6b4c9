package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposes q94_bucketed_join's wall-clock into named components, in the
  * bench's exact environment (local[32], relayouted sf0.1 inputs, fresh
  * bucketed warehouse tables, noop sink, warmup + min-of-3). Round-9's
  * VERDICT flagged the ~1.1 s gap vs the broadcast twin (q87) as an
  * unprofiled hypothesis ("the two bucketed-table scans' fixed overhead");
  * this main replaces the hypothesis with a measurement:
  *
  *   scan_explode_agg  — bucketed lineitem scan + ×100 explode + agg,
  *                       NO join: the floor every join variant shares.
  *   smj_multifile     — q94 as recorded: 32 input partitions × 32 buckets
  *                       = ~32 files/bucket, so Spark cannot trust the
  *                       per-bucket sort and re-sorts BOTH sides in-task.
  *   smj_onefile       — same join, tables written repartition(32, key)
  *                       first = ONE file per bucket: scan-provided
  *                       ordering eliminates the orders-side sort.
  *   shj_colocated     — shuffled-hash hint on the orders side: bucketing
  *                       satisfies the distribution, no exchange AND no
  *                       sort on either side (per-bucket hash build of
  *                       ~150k/32 orders rows).
  *   q87_broadcast     — the broadcast twin, for the reference line.
  *
  * Prints one JSON line with seconds per component plus the Sort-node
  * count observed in each executed plan.
  */
object Q94Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench-identical relayout: 32 splittable files per input table.
    val d = java.nio.file.Files.createTempDirectory("graft_q94prof").toString
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(s"$d/$t.parquet")
    }

    def li = Tables.load(spark, d, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    def ord = Tables.load(spark, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))

    // Multi-file buckets: the current saveBucketed layout.
    graft.sql.QueryEngine.saveBucketed(li, "li_multi", "l_orderkey", 32)
    graft.sql.QueryEngine.saveBucketed(ord, "o_multi", "o_orderkey", 32)
    // One file per bucket: repartition on the key first.
    def saveOneFile(df: DataFrame, table: String, key: String): Unit =
      df.repartition(32, col(key)).write.mode("overwrite")
        .bucketBy(32, key).sortBy(key).saveAsTable(table)
    saveOneFile(li, "li_one", "l_orderkey")
    saveOneFile(ord, "o_one", "o_orderkey")

    import graft.ops.AggOps.{fixedPointSum, unscaledLong}
    def revU = unscaledLong(col("l_extendedprice"), 2) *
      (lit(10000L) - unscaledLong(col("l_discount"), 4))
    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("o_orderpriority"), col("rep"))
        .agg(fixedPointSum(revU, 6, "revenue"), count(lit(1)).as("n_rows"))
        .orderBy("o_orderpriority", "rep")
    def exploded(t: String): DataFrame =
      spark.table(t).withColumn("rep", graft.ops.Replicate.rep(100))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_explode_agg" -> (() =>
        exploded("li_multi")
          .groupBy(col("rep"))
          .agg(fixedPointSum(revU, 6, "revenue"), count(lit(1)).as("n_rows"))
          .orderBy("rep")),
      "smj_multifile" -> (() =>
        agg(exploded("li_multi").hint("merge")
          .join(spark.table("o_multi"), col("l_orderkey") === col("o_orderkey")))),
      "smj_onefile" -> (() =>
        agg(exploded("li_one").hint("merge")
          .join(spark.table("o_one"), col("l_orderkey") === col("o_orderkey")))),
      "shj_colocated" -> (() =>
        agg(exploded("li_one")
          .join(spark.table("o_one").hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey")))),
      "q87_broadcast" -> (() =>
        agg(Tables.load(spark, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .withColumn("rep", graft.ops.Replicate.rep(100))
          .join(broadcast(Tables.load(spark, d, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"))),
            col("l_orderkey") === col("o_orderkey"))))
    )

    def run(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def sortCount(mk: () => DataFrame): Int = {
      val df = mk()
      df.write.mode("overwrite").format("noop").save()
      val executed = df.queryExecution.executedPlan.toString
      "(?m)^.*\\bSort\\b".r.findAllIn(executed).size
    }

    val results = variants.map { case (name, mk) =>
      run(mk) // warmup
      val secs = (1 to 3).map(_ => run(mk)).min
      val sorts = sortCount(mk)
      (name, secs, sorts)
    }
    val json = results.map { case (n, s, k) =>
      f""""$n":{"sec":$s%.3f,"sorts":$k}""" }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
