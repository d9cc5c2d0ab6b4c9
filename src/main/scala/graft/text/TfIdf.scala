package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — the IR-style doc-representation stage (search keys, topic
  * tags, near-dup explanations).
  *
  * Ranking exactness: classic tf·ln(N/df) ranks by a transcendental, and
  * `ln` differs across engines in the last ulp — two close scores could
  * swap ranks between engines. The rank key here is the EXACT rational
  * `tf·N/df` instead (same ordering intent: monotone ↑ in tf, ↓ in df;
  * integer multiply then one IEEE division — bit-identical everywhere),
  * with ties broken by term. The classic `tfidf` value is still reported,
  * fixed-point rounded, it just doesn't decide ranks.
  *
  * Scale shape: explode → per-(doc, term) count (partial-agg) → document
  * frequency derived FROM that table (never a second corpus pass) → a
  * Zipf-skewed term join (AQE skew-split) → a doc-partitioned top-k
  * window. The window key is the doc id — the highest-cardinality key
  * available — so no partition degenerates; k rows leave per doc.
  */
object TfIdf {

  /** BM25 ranked retrieval: the top-`limit` documents for a fixed bag of
    * query terms (Lucene-form idf `ln(1 + (N−df+0.5)/(df+0.5))`,
    * k1/b saturation). The score pipeline is: tf rows filtered to the
    * query's terms (a handful — the per-term stats broadcast), one
    * doc-keyed sum, then a LIMIT-bounded global top-k
    * (TakeOrderedAndProject — bounded, never a full sort). Scores are
    * fixed-point rounded BEFORE ranking and tie-broken by doc id, so the
    * returned set and order are engine-deterministic despite the `ln`. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], limit: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.tokens(col(textCol)).as("ws"))
      .select(id, size(col("ws")).cast("long").as("len"),
        col("ws"))
    val tf = base
      .select(id, col("len"), explode(col("ws")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(id, col("len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1)).cast("double"))
        .as("avg_len"))
    val idf = log(lit(1.0)
      + (col("n").cast("double") - col("df").cast("double") + 0.5)
        / (col("df").cast("double") + 0.5))
    val tfd = col("tf").cast("double")
    val sat = (tfd * (k1 + 1.0)) / (tfd + lit(k1) * (lit(1.0 - b)
      + lit(b) * col("len").cast("double") / col("avg_len")))
    tf.join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(id, (idf * sat).as("part"))
      .groupBy(id)
      .agg(round(sum(col("part")), 6).as("score"))
      .orderBy(col("score").desc, id.asc)
      .limit(limit)
  }

  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.tokens(col(textCol)).as("ws"))
    val tf = base
      .select(id, explode(col("ws")).as("term"))
      .groupBy(id, col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = base.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(id)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n")).cast("double") / col("df").cast("double"))
      .withColumn("tfidf",
        round(col("tf").cast("double")
          * log(col("n").cast("double") / col("df").cast("double")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(id, col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
