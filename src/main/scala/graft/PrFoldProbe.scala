package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMP probe (not part of the engine): A/B the r17 PageRank iteration
  * spelling against the r16 one, interleaved in one JVM over the bench's
  * materialized ×100 fixture (65M string-id edges) — the controlled form
  * on a host with a 2–4× day band.
  *
  *   arm "r16" — per-iteration `ranks ⋈ outdeg` inside the contribution
  *               build + `left_anti outdeg` for the dangling mass (the
  *               committed r16 spelling, inlined below verbatim)
  *   arm "r17" — out-degree carried on the node/rank frames: zero
  *               per-iteration |V|-row joins beyond flaggedC ⋈ contribs
  *               (graft.graph.PageRank as committed)
  *
  * Both arms print their dangling-mass sequence and a rank checksum so
  * the probe itself witnesses bit-equality.
  */
object PrFoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val edges = spark.read.parquet(sys.env.getOrElse(
      "SPARK_GRAFT_PR_FIXTURE",
      "/tmp/graft_sbfix_r16a_630760762929_pr_edges_x100_/t"))

    def checksum(r: DataFrame): Unit = {
      val row = r.agg(
        sum(pmod(xxhash64(col("node"), col("rank")), lit(1000000007L)))
          .as("h"),
        sum(col("rank")).as("s"), count(lit(1)).as("n")).head()
      println(s"[probe] checksum h=${row.get(0)} sum=${row.get(1)} " +
        s"n=${row.get(2)}")
    }

    // r16 core, inlined (run() path: no seeds, no prior)
    def r16Run(edges: DataFrame, iters: Int): DataFrame = {
      val scale = graft.graph.PageRank.Scale
      val e = edges.select(col("src"), col("dst"))
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
        .sortWithinPartitions("src")
        .cache()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .cache()
      val n = nodes.count()
      val flaggedC = nodes.select(col("node"), lit(true).as("is_seed")).cache()
      val s = n
      val outdeg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("od"))
        .cache()
      val r0 = scale / s
      val base = (15L * r0) / 100L
      def dangOf(r: DataFrame): Long =
        r.join(outdeg, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("d"))
          .head().getLong(0)
      var ranks = flaggedC
        .select(col("node"),
          when(col("is_seed"), lit(r0)).otherwise(lit(0L)).as("r"))
        .cache()
      var dang = dangOf(ranks)
      for (_ <- 1 to iters) {
        val dangShare = dang / s
        val contribs = e
          .join(ranks.join(outdeg, Seq("node")).withColumnRenamed("node", "src"),
            Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("r div od")).as("c"))
        val next = flaggedC.join(contribs, Seq("node"), "left")
          .select(col("node"),
            when(col("is_seed"),
              lit(base) +
                expr(s"(85 * (${dangShare}L + coalesce(c, 0L))) div 100"))
              .otherwise(expr("(85 * coalesce(c, 0L)) div 100"))
              .as("r"))
          .cache()
        dang = dangOf(next)
        ranks.unpersist()
        ranks = next
      }
      e.unpersist(); nodes.unpersist(); outdeg.unpersist()
      flaggedC.unpersist()
      ranks.select(col("node"), col("r").as("rank"))
    }

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = f
      r.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$label] full 5-iter run: $dt%.2f s")
      checksum(r)
      r.unpersist()
    }

    // PR_PLAN=1: print each arm's per-iteration plan (the contribution
    // join + dangling-mass chain as one frame, 1 iteration) instead of
    // timing — the plans/r17 before/after evidence.
    if (sys.env.get("PR_PLAN").contains("1")) {
      import org.apache.spark.sql.execution.FormattedMode
      println("===== r16 spelling: iteration-1 'next' frame =====")
      val r16next = {
        val e = edges.select(col("src"), col("dst"))
          .repartition(col("src")).dropDuplicates("src", "dst")
          .sortWithinPartitions("src").cache()
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
        val flaggedC = nodes.select(col("node"), lit(true).as("is_seed")).cache()
        val outdeg = e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("od")).cache()
        val ranks = flaggedC.select(col("node"), lit(625L).as("r"))
        val contribs = e
          .join(ranks.join(outdeg, Seq("node")).withColumnRenamed("node", "src"),
            Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(expr("r div od")).as("c"))
        val next = flaggedC.join(contribs, Seq("node"), "left")
          .select(col("node"), expr("(85 * coalesce(c, 0L)) div 100").as("r"))
        // the dangling-mass action of the r16 spelling: left_anti join
        next.join(outdeg, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("d"))
      }
      println(r16next.queryExecution.explainString(FormattedMode))
      println("===== r17 spelling: iteration-1 'next' frame =====")
      val r17next = {
        val e = edges.select(col("src"), col("dst"))
          .repartition(col("src")).dropDuplicates("src", "dst")
          .sortWithinPartitions("src").cache()
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
        val outdeg = e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("od"))
        val flaggedC = nodes.select(col("node"), lit(true).as("is_seed"))
          .join(outdeg, Seq("node"), "left").cache()
        val ranks = flaggedC.select(col("node"), lit(625L).as("r"), col("od"))
        val contribs = e
          .join(ranks.where(col("od").isNotNull)
              .select(col("node").as("src"), col("r"), col("od")),
            Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(expr("r div od")).as("c"))
        val next = flaggedC.join(contribs, Seq("node"), "left")
          .select(col("node"),
            expr("(85 * coalesce(c, 0L)) div 100").as("r"), col("od"))
        // the dangling-mass action of the r17 spelling: filter + sum
        next.where(col("od").isNull)
          .agg(coalesce(sum(col("r")), lit(0L)).as("d"))
      }
      println(r17next.queryExecution.explainString(FormattedMode))
      spark.stop(); return
    }

    for (pass <- 1 to 2) {
      time(s"pass$pass r16")(r16Run(edges, 5))
      time(s"pass$pass r17")(graft.graph.PageRank.run(edges, iters = 5))
    }
    spark.stop()
  }
}
