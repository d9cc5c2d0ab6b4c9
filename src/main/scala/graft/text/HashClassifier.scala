package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-bag-of-words linear document classifier — the fasttext-style
  * "model-based quality filter" stage (the WebText/CCNet classifier gate),
  * re-expressed relationally. Words hash into `nBuckets` feature buckets;
  * each bucket carries an INTEGER weight in [-1000, 1000] (fixed-point
  * thousandths — integer sums are exact in any order, so the score is
  * bit-identical across engines with no rounding); the document's margin is
  * the mean bucket weight over its word occurrences and the filter keeps
  * positive-margin docs.
  *
  * Two weight sources:
  *   - [[margin]]: weights DERIVED from the bucket id's md5 — a
  *     deterministic stand-in for a trained model that keeps the whole
  *     stage a per-row codegen'd projection: NO shuffle, NO join, runs at
  *     scan speed (the classifier gate is the cheapest stage of the whole
  *     pipeline, exactly as it should be at 100 TB).
  *   - [[marginJoin]]: weights from a (bucket, weight) table — the REAL
  *     trained-model path (load fasttext/logreg weights as parquet).
  *     Explode → broadcast-join the weight table (`nBuckets` rows — always
  *     broadcastable) → one doc-keyed sum. With the hash-derived table the
  *     two paths agree exactly (suite-pinned).
  */
object HashClassifier {

  /** First 8 md5 hex digits as a non-negative long — the cross-engine
    * deterministic hash (DuckDB: `CAST(('0x'||substr(md5(x),1,8)) AS
    * BIGINT)`). */
  def md5Int(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  def bucketOf(word: Column, nBuckets: Int): Column = md5Int(word) % nBuckets

  /** Deterministic stand-in weight for a bucket: integer thousandths in
    * [-1000, 1000]. */
  def weightOf(bucket: Column): Column =
    md5Int(bucket.cast("string")) % 2001 - 1000

  /** Hash-derived weight table as a DataFrame (bucket, weight) — what a
    * real model swap replaces. */
  def hashWeights(df: DataFrame, nBuckets: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    spark.range(nBuckets).select(col("id").as("bucket"),
      weightOf(col("id")).as("weight"))
  }

  private def wordsOf(textCol: Column): Column =
    TextOps.tokens(textCol)

  private def finish(id: Column, nWords: Column, wsum: Column): Seq[Column] =
    Seq(id,
      greatest(coalesce(nWords, lit(0)), lit(0)).cast("long").as("n_words"),
      coalesce(wsum.cast("double")
        / (nullif(greatest(coalesce(nWords, lit(0)), lit(0)), lit(0))
            .cast("double") * 1000.0), lit(0.0)).as("margin"))

  /** Per-doc margin with hash-derived weights: one narrow projection,
    * whole-stage codegen end to end. Output: id, `n_words`, `margin`
    * (mean weight in [-1, 1]), `keep` = margin > 0. */
  def margin(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4096): DataFrame = {
    val ws = wordsOf(col(textCol))
    val wsum = aggregate(
      transform(ws, w => weightOf(bucketOf(w, nBuckets))),
      lit(0L), (acc, x) => acc + x)
    df.select(finish(col(idCol), size(ws), wsum): _*)
      .withColumn("keep", col("margin") > 0)
  }

  /** Per-doc margin against an explicit (bucket, weight) table — the
    * trained-model path. The weight table has `nBuckets` rows, so it is
    * always broadcastable; the plan is explode → broadcast hash join →
    * one partial-aggregatable doc-keyed sum. */
  def marginJoin(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, nBuckets: Int = 4096): DataFrame = {
    val id = col(idCol)
    val base = df.select(id, wordsOf(col(textCol)).as("ws"))
    val summed = base
      .select(id, explode(col("ws")).as("w"))
      .select(id, bucketOf(col("w"), nBuckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(id)
      .agg(sum(col("weight")).as("wsum"), count(lit(1)).as("n"))
    base.select(id, size(col("ws")).as("nw"))
      .join(summed, Seq(idCol), "left")
      .select(finish(id, col("nw"), col("wsum")): _*)
      .withColumn("keep", col("margin") > 0)
  }
}
