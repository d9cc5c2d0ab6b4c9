package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off stage decomposition for q100 (×10 span dedup) — mirrors
  * [[AggProfile]]'s role for the agg entries: time the tokenize floor,
  * the hash/explode floor, the winner aggregate alone, and the full
  * operator, so the residual vs DuckDB is attributed to a stage instead
  * of argued. Run: SPARK_GRAFT_SF_DIR=… runMain graft.Q100Profile. */
object Q100Profile {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    docs.write.mode("overwrite").parquet("/tmp/q100prof_docs")
    def rep10 = spark.read.parquet("/tmp/q100prof_docs")
      .select(col("doc_id").as("d0"), col("text"),
        graft.ops.Replicate.rep(10).as("r"))
      .select((col("d0") * 10 + col("r")).as("doc_id"), col("text"))

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min ${ts.min}%.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    import graft.text.TextOps
    val k = 3
    def kernelHashArr: Column = coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SpanHashes(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            TextOps.tokens(col("text"))), k)),
      array())
    def kernelSpans = rep10
      .select(col("doc_id"), posexplode(kernelHashArr).as(Seq("span_idx", "h")))
    time("tokenize_only") {
      noop(rep10.select(TextOps.tokens(col("text")).as("ws")))
    }
    time("spans_hash_floor_md5") { // the composed pre-kernel spelling
      val base = rep10.select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("ws"),
          floor((size(col("ws")) + (k - 1)) / k.toDouble).cast("long").as("n_spans"))
      val hashArr = when(col("n_spans") > 0,
        transform(sequence(lit(0L), col("n_spans") - 1), i =>
          unhex(md5(concat_ws(" ", slice(col("ws"), (i * k + 1).cast("int"), lit(k)))))))
        .otherwise(array())
      noop(base.select(col("doc_id"), posexplode(hashArr).as(Seq("span_idx", "h"))))
    }
    time("spans_hash_floor_kernel") { // the SpanHashes spelling
      noop(kernelSpans)
    }
    time("winner_agg_kernel") { // + the h-keyed struct-min + per-doc fold
      noop(kernelSpans.groupBy(col("h"))
        .agg(min(struct(col("doc_id").as("d"), col("span_idx").as("i"))).as("w"))
        .groupBy(col("w.d").as("doc_id"))
        .agg(sort_array(collect_list(col("w.i"))).as("keep_idx")))
    }
    time("full_clean") {
      noop(graft.dedup.SpanDedup.clean(rep10, "doc_id", "text", k))
    }
    time("full_clean_sorted") {
      noop(graft.dedup.SpanDedup.clean(rep10, "doc_id", "text", k)
        .orderBy("doc_id"))
    }
    spark.stop()
  }
}
