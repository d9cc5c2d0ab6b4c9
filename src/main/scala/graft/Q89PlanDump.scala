package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan evidence for the q89 stage-1/2 rewrite: the declared query's own
  * explain hides the changed subtree behind stage 4's eager
  * localCheckpoint, so this dumps the PRE-checkpoint `clean` frame
  * (dedup + decontaminate) under both spellings — `before` is the r15
  * code verbatim (groupBy+self-join dedup, flags over the deduped set),
  * `after` mirrors the committed corpusRelease stages 1–2. */
object Q89PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.load(spark,
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/testdata/sf0.001"),
      "documents")

    import graft.curate.Decontaminate
    import graft.text.TextOps
    val bench = d.filter(col("doc_id") % 97 === 0)

    // --- r15 spelling (verbatim from the pre-e76ef00 corpusRelease) ---
    val withFp = d.withColumn("fp", TextOps.fingerprint(col("text")))
    val canon = withFp.groupBy("fp").agg(min("doc_id").as("keep_id"))
    val dedupedOld = withFp.join(canon, "fp")
      .filter(col("doc_id") === col("keep_id")).drop("fp", "keep_id")
    val flaggedOld =
      Decontaminate.flagOverlaps(dedupedOld, bench, "doc_id", "text", 4)
    val cleanOld = dedupedOld
      .join(flaggedOld.select("doc_id"), Seq("doc_id"), "left_anti")

    // --- r16 spelling (mirrors the committed stages 1–2) ---
    val dedupedNew = d
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("keep_id",
        min("doc_id").over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id")).drop("fp", "keep_id")
    val flaggedNew = Decontaminate.flagOverlaps(
      d.select(col("doc_id"), col("text")), bench, "doc_id", "text", 4)
    val cleanNew = dedupedNew
      .join(flaggedNew.select("doc_id"), Seq("doc_id"), "left_anti")

    println("===== q89_clean_before =====")
    println(cleanOld.queryExecution.explainString(FormattedMode))
    println("===== q89_clean_after =====")
    println(cleanNew.queryExecution.explainString(FormattedMode))
    require(cleanOld.exceptAll(cleanNew).isEmpty &&
      cleanNew.exceptAll(cleanOld).isEmpty,
      "q89 stage-1/2 spellings disagree")
    println("[q89] spellings agree (full exceptAll both ways)")
    spark.stop()
  }
}
