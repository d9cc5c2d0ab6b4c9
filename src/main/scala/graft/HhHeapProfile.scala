package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 verdict #5: force the heavy-hitters spill-regime separation that
  * three 16 GB decades (wide/wide2/wide3 — BENCH_COMPARE r13) never
  * produced. Run the wide3 pair (750M tokens, ~600M distinct) under a
  * CONSTRAINED heap (`SPARK_DRIVER_MEM=6g`): the full groupBy's
  * vocabulary-sized aggregation state (~25–35 GB of map entries) MUST
  * leave memory for real, while Misra–Gries' k-bounded per-partition
  * state (≤ 2k+1 entries) stays token-scan-bound at ANY heap. Interleaved
  * min-of-2, both samples printed — the same A/B discipline as the
  * run-of-record pair.
  *
  * Run: `SPARK_DRIVER_MEM=6g SPARK_GRAFT_CPUS=32 sbt "runMain
  * graft.HhHeapProfile"` (and once at 16g for the same-session
  * contrast). */
object HhHeapProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    val heap = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"[hhheap] driver heap ${heap} MiB, cpus $cpus")

    // the wide3 token stream, exactly as ScaleBench.tokensWide3Fixture
    // derives it: 750M tokens, 80% id-unique tail / 20% over 20 hot
    // tokens (~600M distinct) — materialized so no generation cost sits
    // anywhere near a timed region
    val path = "/tmp/graft_hhheap_wide3"
    if (!new java.io.File(path).exists()) {
      spark.range(750000000L).select(
        when(pmod(col("id"), lit(5)) < 4,
          concat(lit("u"), col("id").cast("string")))
          .otherwise(concat(lit("hot"), pmod(col("id"), lit(20))
            .cast("string")))
          .as("token"))
        .write.parquet(path)
    }
    val toks = spark.read.parquet(path)

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // rounds via SPARK_GRAFT_HH_ROUNDS (default 2). Results print
    // PER-SIDE as they land: under a heap the groupBy cannot survive,
    // the JVM dies mid-run and the already-printed MG numbers are the
    // record (6g run of record: round-0 full survived at 62.2 s, the
    // round-1 repeat OOM-killed the JVM from HashAggregate).
    val rounds = sys.env.getOrElse("SPARK_GRAFT_HH_ROUNDS", "2").toInt
    var i = 0
    while (i < rounds) {
      val mg = time(noop(graft.text.HeavyHitters.exact(toks, k = 200)))
      println(f"[hhheap] heap=${heap}MiB round $i mg ${mg}%.1f s")
      val full = time {
        val n = toks.count()
        noop(toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * 200 > n))
      }
      println(f"[hhheap] heap=${heap}MiB round $i full ${full}%.1f s")
      i += 1
    }
    spark.stop()
  }
}
