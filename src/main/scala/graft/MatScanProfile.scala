package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-floor experiment for m_q87_mat's 2.72× (r12): Q87Profile put the
  * 60M-row materialized fixture's scan at ~80% of DuckDB's WHOLE query,
  * so the join/agg levers are exhausted and the scan is the target. Each
  * knob the r12 verdict prescribed gets a timed variant on the SAME
  * logical work (4-col scan + broadcast join + fused agg — the exact
  * m_q87_mat thunk), min-of-3 warm, one JVM:
  *
  *   base32           — the current 32-file fixture, default reader.
  *   batch16k         — columnarReaderBatchSize 4096 → 16384 (fewer
  *                      batch-boundary crossings per task).
  *   files64/files128 — the fixture rewritten at higher file counts:
  *                      each driver file is ONE row group, so
  *                      maxPartitionBytes cannot split below file
  *                      granularity and parallelism = file count. More
  *                      waves ⇒ better decode/agg overlap iff the 32-way
  *                      single wave was leaving cores idle at the tail.
  *   scan_only32      — the bare 4-col scan+noop: the floor itself.
  *
  * r13-continuation verdict (codec dimension, 2026-08-15, same-session
  * DuckDB pairing on the identical files): snappy scan 0.326 vs
  * uncompressed 0.274 vs zstd 0.333 — decompression is ~16% of the
  * Spark scan while DuckDB's uncompressed scan drops to 0.088 (gap
  * WIDENS to 3.1×), so the residual is the vectorized reader's page
  * decode + on-heap value materialization, not the codec; the snappy
  * q87 pairing read 1.90× that session (recorded in BENCH_COMPARE).
  */
object MatScanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def makeSession(batchSize: Int): SparkSession = {
      val s = SparkSession.builder().master("local[32]")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.columnarReaderBatchSize",
          batchSize.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = makeSession(4096)

    val path32 = graft.bench.ScaleBench.lineitemX100Path(spark, sfDir)
    def refiled(n: Int): String = {
      val p = s"${path32}_f$n"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p/_SUCCESS")))
        spark.read.parquet(path32).repartition(n)
          .write.mode("overwrite").parquet(p)
      p
    }
    val path64 = refiled(64)
    val path128 = refiled(128)

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[matscan] $tag%-12s min ${ts.min}%.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    def q87(path: String): DataFrame = {
      import graft.ops.AggOps.{fixedPointSum, unscaledLong}
      val orders = graft.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val li = spark.read.parquet(path)
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"), col("rep"))
      val revU = unscaledLong(col("l_extendedprice"), 2) *
        (lit(10000L) - unscaledLong(col("l_discount"), 4))
      li.join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("rep"))
        .agg(fixedPointSum(revU, 6, "revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderpriority", "rep")
    }

    time("scan_only32") {
      noop(spark.read.parquet(path32).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"), col("rep")))
    }
    time("base32") { noop(q87(path32)) }
    time("files64") { noop(q87(path64)) }
    time("files128") { noop(q87(path128)) }

    spark.stop(); System.gc()
    spark = makeSession(16384)
    time("batch16k_scan") {
      noop(spark.read.parquet(path32).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"), col("rep")))
    }
    time("batch16k") { noop(q87(path32)) }
    time("b16k_f128_scan") {
      noop(spark.read.parquet(path128).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"), col("rep")))
    }
    time("b16k_f128") { noop(q87(path128)) }

    // ---- codec dimension (r13 continuation): with the layout and batch
    // knobs exhausted, is the remaining JVM-vs-native scan gap
    // DECOMPRESSION (snappy in the JVM) or value MATERIALIZATION (page
    // decode into on-heap vectors)? The best layout re-encoded
    // uncompressed and as zstd answers it: if uncompressed ≈ snappy,
    // decompression is not the cost; DuckDB reads the identical files
    // (tools/oracle_time.py --parquet-dir) for the same-session pairing.
    def recoded(codec: String): String = {
      // NOT under the graft_matfix_ prefix: tools/oracle_time.py glob-
      // selects the newest matfix dir as DuckDB's layout, and a codec
      // variant there would silently mismatch the Spark entry's files
      val p = s"/tmp/graft_codecfix_li100_f128_$codec"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p/_SUCCESS")))
        spark.read.parquet(path128)
          .write.option("compression", codec).mode("overwrite").parquet(p)
      p
    }
    val pUnc = recoded("uncompressed")
    val pZstd = recoded("zstd")
    time("b16k_unc_scan") {
      noop(spark.read.parquet(pUnc).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"), col("rep")))
    }
    time("b16k_unc") { noop(q87(pUnc)) }
    time("b16k_zstd_scan") {
      noop(spark.read.parquet(pZstd).select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"), col("rep")))
    }
    time("b16k_zstd") { noop(q87(pZstd)) }
    println(s"[matscan] codec dirs: unc=$pUnc zstd=$pZstd")
    spark.stop()
  }
}
