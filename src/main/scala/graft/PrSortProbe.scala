package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMP probe (not part of the engine): A/B the PageRank edge-cache
  * spellings over the bench's materialized ×100 fixture (65M string-id
  * edges), interleaved in one JVM.
  *
  *   arm "plain"  — repartition(src) + dropDuplicates, unsorted cache
  *                  (the pre-r16 spelling)
  *   arm "sorted" — + sortWithinPartitions("src") (committed r16)
  *   arm "hashed" — sorted + node ids pre-encoded to xxhash64 longs
  *                  (the candidate §2.3 narrower-types change: every
  *                  per-iteration exchange/join/sort moves 8-byte longs
  *                  instead of ~8–12-char UTF8 strings)
  */
object PrSortProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val raw0 = spark.read.parquet(sys.env.getOrElse(
      "SPARK_GRAFT_PR_FIXTURE",
      "/tmp/graft_sbfix_r16a_630760762929_pr_edges_x100_/t"))

    def mkEdges(variant: String): DataFrame = {
      val raw = variant match {
        case "hashed" => raw0.select(
          xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
        case _ => raw0.select(col("src"), col("dst"))
      }
      val base = raw.repartition(col("src")).dropDuplicates("src", "dst")
      (if (variant == "plain") base
       else base.sortWithinPartitions("src")).cache()
    }

    def oneIter(e: DataFrame, label: String): Double = {
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
      outdeg.unpersist()
      dt
    }

    for (pass <- 1 to 2; v <- Seq("sorted", "hashed")) {
      val e = mkEdges(v)
      val t0 = System.nanoTime()
      e.count()
      println(f"[pass$pass $v] cache build: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      oneIter(e, s"pass$pass $v iter1")
      oneIter(e, s"pass$pass $v iter2")
      e.unpersist(blocking = true)
    }
    spark.stop()
  }
}
