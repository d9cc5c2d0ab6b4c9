package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMP probe (not part of the engine): does sorting the PageRank edge
  * cache within partitions remove the per-iteration SMJ sort on the
  * |E|-row side, and what does one iteration cost each way? Runs the
  * exact core-iteration shape over the bench's materialized ×100
  * fixture, interleaved A/B. */
object PrSortProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val raw = spark.read.parquet(sys.env.getOrElse(
      "SPARK_GRAFT_PR_FIXTURE",
      "/tmp/graft_sbfix_r16a_630760762929_pr_edges_x100_/t"))

    def mkEdges(sorted: Boolean): DataFrame = {
      val base = raw.select(col("src"), col("dst"))
        .repartition(col("src"))
        .dropDuplicates("src", "dst")
      (if (sorted) base.sortWithinPartitions("src") else base).cache()
    }

    def oneIter(e: DataFrame, label: String, explain: Boolean): Double = {
      val outdeg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("od")).cache()
      val ranks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .select(col("node"), lit(1000000L).as("r"))
      val contribs = e
        .join(ranks.join(outdeg, Seq("node")).withColumnRenamed("node", "src"),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div od")).as("c"))
      val t0 = System.nanoTime()
      contribs.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$label] one-iteration join+agg: $dt%.2f s")
      if (explain) {
        println(s"===== executed plan [$label] =====")
        println(contribs.queryExecution.executedPlan.toString)
      }
      outdeg.unpersist()
      dt
    }

    // interleaved: unsorted, sorted, unsorted, sorted — fresh edge cache
    // per pass so cache-build order can't favor one arm
    for (pass <- 1 to 2; sorted <- Seq(false, true)) {
      val e = mkEdges(sorted)
      val t0 = System.nanoTime()
      e.count() // materialize cache (pays the sort in the sorted arm)
      println(f"[pass$pass sorted=$sorted] cache build: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      oneIter(e, s"pass$pass sorted=$sorted iter1", explain = pass == 1)
      oneIter(e, s"pass$pass sorted=$sorted iter2", explain = false)
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
