package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired timing for the r14-continuation families (q159/q160/q161/q163
  * plus the tokenizer-form A/B and the ×10/×100 decades) at sf0.1:
  * Spark side with one untimed warmup + min-of-3 against a noop sink.
  * Query entries are constructed INSIDE the timed thunk — the same
  * contract [[graft.Bench]] times, so these numbers pair with the bench
  * artifact (driver-side plan assembly is part of every entry's cost on
  * both harnesses; for q161 construction IS execution — the iterations
  * collect scalars eagerly). The DuckDB half of each pairing runs in the
  * same session window on the identical oracle SQL / twin construction
  * (see BENCH_COMPARE r14 continuation). Run:
  * SPARK_GRAFT_SF_DIR=… runMain graft.GraphLineProfile. */
object GraphLineProfile {
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

    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-18s min ${ts.min}%.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    def noopDf(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def noop(name: String): Unit =
      noopDf(SparkEntry.queries(name)(spark, sfDir))

    time("q159_line_clean") { noop("q159_line_clean") }
    time("q160_line_dedup") { noop("q160_line_dedup") }
    time("q161_pagerank") { noop("q161_pagerank") }
    time("q163_bpe_encode") { noop("q163_bpe_encode") }

    // the tokenizer-form A/B: interpreted HOF fold vs codegen'd replace
    // chain, same bits (BpeSpec), q163's OWN merge table over the corpus
    import graft.text.Bpe
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val merges = graft.queries.PipelineQueries.q163Merges
    time("tokenize_fold") { noopDf(Bpe.tokenize(docs, "text", merges)) }
    time("tokenize_fast") { noopDf(Bpe.tokenizeFast(docs, "text", merges)) }

    // PageRank ×10 decade: ten DISJOINT suffix-tagged copies of the
    // corpus graph (~650k → 6.5M edges, 16k → 160k nodes) — per-copy
    // ranks must equal the ×1 run, so the decade is self-verifying; the
    // DuckDB twin replicates identically
    val e1 = graft.graph.PageRank.corpusEdges(spark, sfDir)
    val e10 = e1.select(col("src"), col("dst"),
        explode(sequence(lit(0), lit(9))).as("r"))
      .select(concat(col("src"), lit("_"), col("r")).as("src"),
        concat(col("dst"), lit("_"), col("r")).as("dst"))
    time("pagerank_x10") {
      noopDf(graft.graph.PageRank.run(e10, iters = 5))
    }
    if (sys.env.get("SPARK_GRAFT_PAGERANK_X100").contains("1")) {
      val e100 = e1.select(col("src"), col("dst"),
          explode(sequence(lit(0), lit(99))).as("r"))
        .select(concat(col("src"), lit("_"), col("r")).as("src"),
          concat(col("dst"), lit("_"), col("r")).as("dst"))
      time("pagerank_x100") {
        noopDf(graft.graph.PageRank.run(e100, iters = 5))
      }
    }

    // line-dedup ×10/×100 decades: replica-tagged copies of the SAME
    // lined fixture the oracled q159/q160 derive (PipelineQueries
    // .linedDocs — shared, so the decade measures the hash-green
    // queries' exact input); each line gets a per-replica suffix, so
    // replicas are disjoint and each replica's hot set equals the ×1
    // run — self-verifying
    val lined1 = graft.queries.PipelineQueries.linedDocs(spark, sfDir)
    def linedRep(n: Int): DataFrame = lined1
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(n - 1))).as("r"))
      .select((col("doc_id") + col("r").cast("long") * lit(10000000L))
          .as("doc_id"),
        array_join(
          transform(split(col("text"), "\n"),
            l => concat_ws(" #", l, col("r").cast("string"))),
          "\n").as("text"))
      .localCheckpoint(true)
    val lined10 = linedRep(10)
    time("linededup_x10") {
      noopDf(graft.text.LineClean.dropRepeatedLines(
        lined10, "doc_id", "text", maxDocs = 2))
    }
    // the reassembly-free broadcast-probe form (r14 prescription #6):
    // same bits (LineCleanSpec), hot set broadcast as ONE sorted-array
    // row, per-doc binary-search filter — the (pos, line) regroup gone
    time("linededup_ip_x10") {
      noopDf(graft.text.LineClean.dropRepeatedLinesInPlace(
        lined10, "doc_id", "text", maxDocs = 2))
    }
    val lined100 = linedRep(100)
    time("linededup_x100") {
      noopDf(graft.text.LineClean.dropRepeatedLines(
        lined100, "doc_id", "text", maxDocs = 2))
    }
    time("linededup_ip_x100") {
      noopDf(graft.text.LineClean.dropRepeatedLinesInPlace(
        lined100, "doc_id", "text", maxDocs = 2))
    }
    spark.stop()
  }
}
