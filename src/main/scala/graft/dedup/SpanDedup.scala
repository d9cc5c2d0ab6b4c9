package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** An incremental span-dedup step: the `cleaned` batch (same schema as
  * [[SpanDedup.clean]]) and `newSpans` — the distinct span hashes this
  * batch contributes, to be appended to the registry for the next batch. */
case class SpanBatch(cleaned: DataFrame, newSpans: DataFrame)

/** Corpus-level duplicate-span removal — the C4 rule ("any three-sentence
  * span occurring more than once in the corpus is removed, keeping one")
  * re-expressed relationally. The corpus here has no sentence boundaries,
  * so the span unit is k consecutive words of the canonical form
  * ([[TextOps.normalized]]): a deterministic segmentation both engines
  * reproduce exactly. The FIRST occurrence in corpus order — lexicographic
  * min of (doc id, span index) — survives; every later occurrence,
  * including repeats inside the same document, is dropped, and each
  * document is reassembled from its surviving spans in order.
  *
  * Scale shape: explode (×spans/doc) → ONE groupBy shuffle on the span's
  * md5 with a map-side-combined struct-min whose payload CARRIES the
  * winning occurrence's (doc, index, text) — the surviving span set is a
  * projection of that aggregate, so there is no join back at all (the
  * earlier shape probed the full span stream against the winner table; a
  * hot span — boilerplate repeated across millions of pages, the exact
  * motivation for the operator — now collapses map-side to one struct per
  * input partition and is never probed). Then one doc-keyed reassembly
  * aggregation over the survivors only. No windows, no driver-side state;
  * every aggregate is partial-aggregatable.
  */
object SpanDedup {

  /** (base: id|ws|n_spans, spans: id|span_idx|span|h). */
  private def spansOf(df: DataFrame, idCol: String, textCol: String,
      k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"span size must be >= 1, got $k")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.tokens(col(textCol)).as("ws"))
      .select(id, col("ws"),
        floor((size(col("ws")) + (k - 1)) / k.toDouble).cast("long")
          .as("n_spans"))
    // Guarded: sequence(0, -1) would yield [0, -1] (Spark picks step -1),
    // so a NULL-text doc (size(null) = -1 → n_spans 0) must short-circuit.
    val spanArr: Column =
      when(col("n_spans") > 0,
        transform(sequence(lit(0L), col("n_spans") - 1), i =>
          concat_ws(" ", slice(col("ws"), (i * k + 1).cast("int"), lit(k)))))
        .otherwise(array())
    val spans = base
      .select(id, posexplode(spanArr).as(Seq("span_idx", "span")))
      .withColumn("h", md5(col("span")))
    (base, spans)
  }

  /** Batch-first-occurrence filter + per-doc reassembly over a span set.
    * The struct-min carries the span text alongside the (doc, index)
    * order key: (d, i) uniquely identifies an occurrence, so the min over
    * (d, i, span) IS the winning row — `kept` is a projection of the
    * aggregate, no join back against the span stream. */
  private def dedupAndRebuild(base: DataFrame, spans: DataFrame,
      idCol: String): DataFrame = {
    val id = col(idCol)
    val kept = spans
      .groupBy(col("h"))
      .agg(min(struct(id.as("d"), col("span_idx").as("i"),
        col("span").as("s"))).as("w"))
      .select(col("w.d").as(idCol), col("w.i").as("span_idx"),
        col("w.s").as("span"))
    val rebuilt = kept
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("span_idx"), col("span")))),
            s => s.getField("span")),
          " ").as("clean_text"))
    base.select(id, col("n_spans"))
      .join(rebuilt, Seq(idCol), "left")
      .select(id, coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Per-document result: `n_spans`, `n_kept` (spans surviving corpus-level
    * dedup), and `clean_text` (the document rebuilt from surviving spans,
    * space-joined; empty when nothing survives). Documents whose text
    * normalizes to nothing still appear, with their single empty span
    * subject to the same first-occurrence rule. */
  def clean(df: DataFrame, idCol: String, textCol: String, k: Int = 3)
      : DataFrame = {
    val (base, spans) = spansOf(df, idCol, textCol, k)
    dedupAndRebuild(base, spans, idCol)
  }

  /** Incremental form — the production shape for a continuously-ingested
    * corpus: dedup ONE batch against the accumulated span registry without
    * ever re-reading the lake. `registry` needs a single column `h` (md5
    * of the span text — what [[SpanBatch.newSpans]] emits; bucket-write it
    * on `h` and the anti-join below consumes bucketing exchange-free). A
    * batch span survives iff its hash is NOT in the registry (anti-join)
    * AND it is the batch-first occurrence (same winner rule as [[clean]]).
    * Appending `newSpans` to the registry makes consecutive batches
    * equivalent to one [[clean]] over their concatenation in batch order.
    * Never call an action on `cleaned`/`newSpans` twice without persisting
    * if the batch source is non-deterministic. */
  def incremental(batch: DataFrame, idCol: String, textCol: String,
      registry: DataFrame, k: Int = 3): SpanBatch = {
    val (base, spans) = spansOf(batch, idCol, textCol, k)
    val fresh = spans.join(registry.select(col("h")), Seq("h"), "left_anti")
    val cleaned = dedupAndRebuild(base, fresh, idCol)
    SpanBatch(cleaned, fresh.select(col("h")).distinct())
  }
}
