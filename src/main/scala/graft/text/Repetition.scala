package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-document repetition metrics — the "remove boilerplate / degenerate
  * repetition" stage of a training-data pipeline (the Gopher/MassiveText
  * repetition rules, re-expressed relationally): per document, the fraction
  * of words that are repeats and the share of the text consumed by its most
  * frequent word n-gram, plus the keep/drop verdict at given thresholds.
  *
  * Scale shape: one explode over word n-grams followed by two
  * partial-aggregatable aggregations keyed by (doc, gram) then (doc) — the
  * same cardinality the shingle-based dedup stages already shuffle, with
  * map-side combine throughout, no windows. The top-gram argmax is
  * `max(struct(cnt, gram))` (ties resolve to the lexicographically LARGEST
  * gram), a deterministic ordering both engines reproduce, rather than a
  * per-doc row_number window: a struct-max aggregates partially, a window
  * cannot.
  */
object Repetition {

  /** Per-document metrics over [[TextOps.normalized]] words.
    *
    * Output columns: id, `n_words`, `n_distinct_words`,
    * `dup_word_frac` = 1 − distinct/total, `top_gram` (empty when the doc
    * has fewer than `n` words), `top_gram_n`, `top_gram_frac` =
    * top-gram occurrences / n-gram count, `keep` = both fractions at or
    * under their thresholds.
    */
  def metrics(df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      maxDupWordFrac: Double = 0.55, maxTopGramFrac: Double = 0.05)
      : DataFrame = {
    require(n >= 2, s"gram size must be >= 2, got $n")
    val base = df
      .select(col(idCol),
        TextOps.words(TextOps.normalized(col(textCol))).as("ws"))
      .select(col(idCol), col("ws"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"))
    val counts = base
      .select(col(idCol), explode(TextOps.wordShingles(col("ws"), n)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val top = counts
      .groupBy(col(idCol))
      .agg(max(struct(col("cnt"), col("gram"))).as("t"))
      .select(col(idCol), col("t.gram").as("top_gram"),
        col("t.cnt").as("top_gram_n"))
    base.drop("ws")
      .join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("n_distinct_words"),
        coalesce(lit(1.0) - col("n_distinct_words").cast("double") /
          nullif(col("n_words"), lit(0L)).cast("double"), lit(0.0))
          .as("dup_word_frac"),
        coalesce(col("top_gram"), lit("")).as("top_gram"),
        coalesce(col("top_gram_n"), lit(0L)).as("top_gram_n"),
        coalesce(col("top_gram_n").cast("double") /
          nullif(col("n_words") - (n - 1), lit(0L)).cast("double"), lit(0.0))
          .as("top_gram_frac"))
      .withColumn("keep",
        col("dup_word_frac") <= maxDupWordFrac &&
          col("top_gram_frac") <= maxTopGramFrac)
  }

  /** The filter itself: documents whose repetition metrics pass. */
  def filter(df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      maxDupWordFrac: Double = 0.55, maxTopGramFrac: Double = 0.05)
      : DataFrame =
    df.join(
      metrics(df, idCol, textCol, n, maxDupWordFrac, maxTopGramFrac)
        .where(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")
}
