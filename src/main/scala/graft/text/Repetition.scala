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
        TextOps.tokens(col(textCol)).as("ws"))
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

  /** The full Gopher char-fraction repetition suite (Rae et al. 2021,
    * table A1): per document, the fraction of characters covered by the
    * most frequent word n-gram for each n in `topNs`, and the char mass of
    * ALL duplicated n-grams for each n in `dupNs`. Deterministic
    * relational definition: gram length is the space-joined gram's char
    * count, the denominator is the normalized doc's char count, and the
    * duplicate mass counts every occurrence (`Σ_{c(g)≥2} c(g)·len(g)`,
    * overlaps NOT collapsed — so dup fractions can exceed 1 on degenerate
    * text; threshold semantics are unaffected). Top-gram ties resolve to
    * the lexicographically largest gram, as in [[metrics]].
    *
    * Scale shape: ONE explode producing every (n, gram) pair (explode
    * factor ≈ |dupNs ∪ topNs| × words — the published algorithm's cost),
    * then two partial-aggregatable groupBys ((doc, n, gram) counts, then
    * per-(doc, n) struct-max + conditional sums), then a conditional-
    * aggregation collapse to one wide row per doc. No windows.
    */
  def charMetrics(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = 5 to 10)
      : DataFrame = {
    require((topNs ++ dupNs).forall(_ >= 2), "gram sizes must be >= 2")
    val id = col(idCol)
    val ns = (topNs ++ dupNs).distinct.sorted
    val base = df
      .select(id, TextOps.normalized(col(textCol)).as("norm"))
      .select(id, length(col("norm")).cast("long").as("n_chars"),
        TextOps.words(col("norm")).as("ws"))
    val tagged = base
      .select(id, col("n_chars"),
        explode(flatten(array(ns.map(n =>
          transform(TextOps.wordShingles(col("ws"), n), g =>
            struct(lit(n).as("n"), g.as("gram")))): _*))).as("e"))
      .select(id, col("n_chars"), col("e.n").as("n"), col("e.gram").as("gram"))
    val counts = tagged
      .groupBy(id, col("n_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val perN = counts
      .groupBy(id, col("n_chars"), col("n"))
      .agg(max(struct(col("cnt"), col("gram"))).as("t"),
        sum(when(col("cnt") >= 2,
          col("cnt") * length(col("gram")).cast("long")).otherwise(0L))
          .as("dup_mass"))
    val aggs = topNs.map(n =>
        max(when(col("n") === n, col("t"))).as(s"t$n")) ++
      dupNs.map(n =>
        max(when(col("n") === n, col("dup_mass"))).as(s"d$n"))
    val wide = perN.groupBy(id, col("n_chars"))
      .agg(aggs.head, aggs.tail: _*)
    val denom = nullif(col("n_chars"), lit(0L)).cast("double")
    base.select(id, col("n_chars"))
      .join(wide.drop("n_chars"), Seq(idCol), "left")
      .select(id +: col("n_chars") +:
        (topNs.map(n => coalesce(
          (col(s"t$n.cnt") * length(col(s"t$n.gram")).cast("long"))
            .cast("double") / denom, lit(0.0)).as(s"top${n}_frac")) ++
         dupNs.map(n => coalesce(
          col(s"d$n").cast("double") / denom, lit(0.0))
            .as(s"dup${n}_frac"))): _*)
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
