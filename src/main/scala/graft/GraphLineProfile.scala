package graft

import org.apache.spark.sql.SparkSession

/** Paired timing for the r14-continuation families (q159/q160/q161) at
  * sf0.1: Spark side with one untimed warmup + min-of-3 against a noop
  * sink, construction outside the timed region (the bench protocol). The
  * DuckDB half of the pairing runs in the same session window via
  * tools/oracle_time-style timing of the identical oracle SQL (see
  * BENCH_COMPARE r14 continuation). Run:
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
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    time("q159_line_clean") { noop("q159_line_clean") }
    time("q160_line_dedup") { noop("q160_line_dedup") }
    time("q161_pagerank") { noop("q161_pagerank") }
    time("q163_bpe_encode") { noop("q163_bpe_encode") }

    // the tokenizer-form A/B: interpreted HOF fold vs codegen'd replace
    // chain, same bits (BpeSpec), 8 merges over the corpus
    import graft.text.Bpe
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .localCheckpoint(true)
    val merges = Seq(
      Bpe.Merge(1, "e", "r", "er", 0L), Bpe.Merge(2, "i", "n", "in", 0L),
      Bpe.Merge(3, "s", "t", "st", 0L), Bpe.Merge(4, "t", "a", "ta", 0L),
      Bpe.Merge(5, "ta", "b", "tab", 0L), Bpe.Merge(6, "tab", "l", "tabl", 0L),
      Bpe.Merge(7, "tabl", "e", "table", 0L), Bpe.Merge(8, "o", "w", "ow", 0L))
    def noopDf(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("tokenize_fold") { noopDf(Bpe.tokenize(docs, "text", merges)) }
    time("tokenize_fast") { noopDf(Bpe.tokenizeFast(docs, "text", merges)) }

    // PageRank ×10 decade: ten DISJOINT suffix-tagged copies of the
    // corpus graph (~650k → 6.5M edges, 16k → 160k nodes) — per-copy
    // ranks must equal the ×1 run, so the decade is self-verifying; the
    // DuckDB twin replicates identically (see tools notes in
    // BENCH_COMPARE r14 continuation)
    import org.apache.spark.sql.functions.{col, concat, lit, explode, sequence}
    val e1 = graft.graph.PageRank.corpusEdges(spark, sfDir)
    val e10 = e1.select(col("src"), col("dst"),
        explode(sequence(lit(0), lit(9))).as("r"))
      .select(concat(col("src"), lit("_"), col("r")).as("src"),
        concat(col("dst"), lit("_"), col("r")).as("dst"))
    time("pagerank_x10") {
      noopDf(graft.graph.PageRank.run(e10, iters = 5))
    }

    // line-dedup ×10 decade: ten replica-tagged copies of the LINED
    // corpus (each line gets a per-replica suffix, so replicas are
    // disjoint and each replica's hot set equals the ×1 run —
    // self-verifying, same trick as pagerank_x10)
    import org.apache.spark.sql.functions.{array_join, split, transform,
      concat_ws}
    val ws = graft.text.TextOps.tokens(col("text"))
    val lined1 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        array_join(
          transform(
            org.apache.spark.sql.functions.sequence(lit(0),
              org.apache.spark.sql.functions.floor(
                (org.apache.spark.sql.functions.size(ws) + lit(7)) / lit(8))
                .cast("int") - 1),
            i => array_join(org.apache.spark.sql.functions.slice(
              ws, i * lit(8) + lit(1), lit(8)), " ")),
          "\n").as("text"))
    def linedRep(n: Int): org.apache.spark.sql.DataFrame = lined1
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
    val lined100 = linedRep(100)
    time("linededup_x100") {
      noopDf(graft.text.LineClean.dropRepeatedLines(
        lined100, "doc_id", "text", maxDocs = 2))
    }
    spark.stop()
  }
}
