package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the ×100 aggregate floor (q75/q79/q87):
  * decomposes the 60M-row pipeline into its stages and A/Bs aggregate
  * formulations (string vs packed-long group keys, decimal vs fixed-point
  * sums) so the recorded bench entries' residual constant is attributed,
  * not guessed. Run: SPARK_GRAFT_SF_DIR=<dir> runMain graft.AggProfile. */
object AggProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.AggOps.{fixedPointSum, unscaledLong}

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[aggprof] $name%-38s ${ts.min}%.3f s (min of 3)")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val dq = col("l_quantity").cast("decimal(12,2)")

    time("scan only")(li)
    time("scan+explode100")(
      li.withColumn("rep", graft.ops.Replicate.rep(100)))
    time("explode+count-only agg")(
      li.withColumn("rep", graft.ops.Replicate.rep(100))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("rep"))
        .agg(count(lit(1)).as("n")))
    time("q79 shape: fixedpoint str keys")(
      li.withColumn("rep", graft.ops.Replicate.rep(100))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("rep"))
        .agg(fixedPointSum(unscaledLong(col("l_quantity"), 2), 2, "sum_qty"),
          count(lit(1)).as("n")))
    time("q79 shape: packed long key")(
      li.withColumn("rep", graft.ops.Replicate.rep(100))
        .groupBy((((ascii(col("l_returnflag")) * 128 +
          ascii(col("l_linestatus"))) * 128) + col("rep")).as("k"))
        .agg(fixedPointSum(unscaledLong(col("l_quantity"), 2), 2, "sum_qty"),
          count(lit(1)).as("n")))
    time("q75 shape: decimal sums str keys")(
      li.withColumn("rep", graft.ops.Replicate.rep(100))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("rep"))
        .agg(sum(dq).cast("double").as("sum_qty"),
          count(lit(1)).as("n")))
    time("rep-first explode order")(
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .withColumn("rep", graft.ops.Replicate.rep(100))
        .groupBy(col("rep"), col("l_returnflag"), col("l_linestatus"))
        .agg(fixedPointSum(unscaledLong(col("l_quantity"), 2), 2, "sum_qty"),
          count(lit(1)).as("n")))

    // ---- fused-kernel decomposition (q79 shape)
    val liRaw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def pre79 = liRaw.filter(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        unscaledLong(col("l_quantity"), 2).as("uq"),
        (unscaledLong(col("l_extendedprice"), 2) *
          (lit(10000L) - unscaledLong(col("l_discount"), 4))).as("urev"))
    def timeRdd(name: String)(act: => Unit): Unit = {
      act // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"[aggprof] $name%-38s ${ts.min}%.3f s (min of 3)")
    }
    time("pre79 projection via noop")(pre79)
    timeRdd("pre79.rdd drain") {
      pre79.rdd.foreachPartition(it => while (it.hasNext) it.next())
    }
    timeRdd("ReplicateAgg partials drain") {
      graft.ops.ReplicateAgg
        .partials(pre79, Seq("l_returnflag", "l_linestatus"), 100,
          Seq("uq", "urev"))
        .rdd.foreachPartition(it => while (it.hasNext) it.next())
    }
    time("q79 full fused form")(
      graft.ops.ReplicateAgg
        .partials(pre79, Seq("l_returnflag", "l_linestatus"), 100,
          Seq("uq", "urev"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("rep"))
        .agg(fixedPointSum(col("uq"), 2, "sum_qty"),
          fixedPointSum(col("urev"), 6, "sum_disc_price"),
          sum(col("__pn")).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus", "rep"))
    time("fused, agg only (no orderBy)")(
      graft.ops.ReplicateAgg
        .partials(pre79, Seq("l_returnflag", "l_linestatus"), 100,
          Seq("uq", "urev"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("rep"))
        .agg(fixedPointSum(col("uq"), 2, "sum_qty"),
          fixedPointSum(col("urev"), 6, "sum_disc_price"),
          sum(col("__pn")).as("count_order")))
    time("partials via noop (no finish)")(
      graft.ops.ReplicateAgg
        .partials(pre79, Seq("l_returnflag", "l_linestatus"), 100,
          Seq("uq", "urev")))
    spark.stop()
  }
}
