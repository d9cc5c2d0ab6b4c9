package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the q164 funnel's exchange count (r15 prescription:
  * m_funnel_x100 reads 5.4× vs DuckDB at 10M events, both engines flat
  * across the decade — constant-bound; the one untried lever is fusing
  * the three conditional-MIN chains onto ONE exchange).
  *
  * A = the committed spelling: three filtered streams, each groupBy
  *     shuffling its own filtered rows (3 narrow exchanges, but also 3
  *     scans and 3 stage barriers).
  * B = the fused spelling: filter to the three funnel types once,
  *     repartition(user_id) ONCE, and derive every stage aggregate and
  *     join from that shared child — Catalyst's ReuseExchange collapses
  *     the three branches onto one physical shuffle, and every groupBy /
  *     join downstream is partition-local (HashPartitioning(user_id)
  *     already satisfied).
  *
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.FunnelProfile [times]
  * Prints interleaved A/B samples at the given replication.
  */
object FunnelProfile {
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private[graft] def funnelFusedOf(e: DataFrame): DataFrame = {
    val parted = e
      .filter(col("event_type").isin("view", "click", "purchase"))
      .repartition(col("user_id"))
    val a = parted.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t0"))
    val b = parted.filter(col("event_type") === "click")
      .join(a, Seq("user_id"))
      .filter(col("ts_us") > col("t0"))
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val c = parted.filter(col("event_type") === "purchase")
      .join(b, Seq("user_id"))
      .filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"))
    a.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
      .unionAll(b.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val times = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_funnelfix_x$times"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_SUCCESS"))) {
      graft.queries.CdcQueries.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          graft.ops.Replicate.rep(times).as("r"))
        .select((col("user_id") + col("r") * lit(100000000L)).as("user_id"),
          col("event_type"), col("ts_us"))
        .repartition(cpus)
        .write.mode("overwrite").parquet(path)
    }
    val e = spark.read.parquet(path)

    // equality check once (cheap; funnel output is 3 rows)
    val aRows = graft.queries.CdcQueries.funnelOf(e).collect().toSeq
    val bRows = funnelFusedOf(e).collect().toSeq
    println(s"[funnel] A=$aRows")
    println(s"[funnel] B=$bRows")
    require(aRows.map(_.toString) == bRows.map(_.toString),
      "fused funnel diverged from the committed spelling")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    noop(graft.queries.CdcQueries.funnelOf(e)); noop(funnelFusedOf(e))
    val as = new Array[Double](4); val bs = new Array[Double](4)
    (0 until 4).foreach { i =>
      as(i) = time(noop(graft.queries.CdcQueries.funnelOf(e)))
      bs(i) = time(noop(funnelFusedOf(e)))
    }
    println(f"[funnel] x$times A(3-exchange) ${as.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[funnel] x$times B(fused)      ${bs.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
