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
  * Scale shape: the DEDUP exchanges carry no text — no span STRING is
  * ever built on the dedup path. The explode emits
  * `(doc, span_idx, h)` where `h` is a 16-byte binary span key from the
  * [[graft.functions.SpanHashes]] kernel (one native pass over the
  * doc's word array inside the scan-side codegen span); one groupBy
  * shuffle on `h` with a
  * map-side-combined struct-min over `(doc, idx)` picks each span's
  * first occurrence (a hot span — boilerplate repeated across millions
  * of pages, the exact motivation for the operator — collapses map-side
  * to one 32-byte struct per input partition and is never probed); a
  * second light shuffle folds the winning indices per doc into a sorted
  * long array. Text then crosses exactly ONE exchange: the reassembly
  * join's base side ships each doc's words array ONCE to meet its
  * keep-list, and the surviving span strings are rebuilt from it
  * locally. (The earlier shapes shuffled span text TWICE — under the
  * struct-min and under the reassembly collect_list — with hot spans
  * duplicated per occurrence. At 100 TB the span-text stream is the
  * corpus × ~duplication factor; now the dedup exchanges carry 32–48
  * bytes per span and ~8 per survivor, and the one text exchange is
  * corpus-sized exactly once — or zero on a corpus ingested bucketed by
  * doc id, where the join consumes the bucketing. PlanLintSpec pins the
  * no-text-in-dedup-exchanges property on q98's physical plan.) The key
  * is 16 bytes from two 64-bit lanes of DIFFERENT hash families
  * (xxhash64 + murmur2-64 — see [[graft.functions.SpanHashes]] for the
  * collision arithmetic and why same-family two-seed lanes would be
  * weaker): at corpus scale (billions of distinct spans) a single
  * 64-bit key would already be birthday-colliding and silently merging
  * unrelated spans. No windows, no driver-side state; every aggregate
  * is partial-aggregatable.
  */
object SpanDedup {

  /** The span text at index `i` of words array `ws` — built on demand
    * (map-side, codegen'd) wherever a span string is needed; never
    * stored, never shuffled. */
  private def spanText(ws: Column, i: Column, k: Int): Column =
    concat_ws(" ", slice(ws, (i * k + 1).cast("int"), lit(k)))

  /** (base: id|ws|n_spans, spans: id|span_idx|h) — `h` the 16-byte
    * binary span key from the [[graft.functions.SpanHashes]] kernel
    * (one native pass per doc: no per-span index/slice/concat/md5
    * allocation chain), computed inside the map-side projection so only
    * (id, idx, h) ever reaches an exchange. */
  private def spansOf(df: DataFrame, idCol: String, textCol: String,
      k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"span size must be >= 1, got $k")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.tokens(col(textCol)).as("ws"))
      .select(id, col("ws"),
        floor((size(col("ws")) + (k - 1)) / k.toDouble).cast("long")
          .as("n_spans"))
    // null text ⇒ null ws ⇒ null kernel result: coalesce to no spans
    val hashArr: Column = coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SpanHashes(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("ws")), k)),
      array())
    val spans = base
      .select(id, posexplode(hashArr).as(Seq("span_idx", "h")))
    (base, spans)
  }

  /** Batch-first-occurrence filter + per-doc reassembly over a hashed
    * span set. (d, i) uniquely identifies an occurrence, so the minimum
    * over (d, i) per hash IS the winning occurrence; the winners fold to
    * one sorted index array per doc, and the join back to `base`
    * rebuilds each survivor's text from the doc's own words array — the
    * only place span text exists after the scan.
    *
    * The argmin is computed over ONE packed `decimal(38,0)` —
    * `d·2³² + i` — rather than `min(struct(d, i))`: a struct buffer is
    * not HashAggregate-mutable, so the struct spelling silently planned
    * a SortAggregate with an in-task sort of the FULL span stream on
    * both sides of the exchange (profiled at most of the winner stage's
    * cost). The packing is order-isomorphic to lexicographic (d, i) for
    * every long d, negative included, because 0 ≤ i < 2³² (span_idx is
    * a generator position, capped at 2³¹) and the arithmetic is exact
    * integer decimal — |d|·2³² + i < 4·10²⁸ ≪ 10³⁸, and the unpack
    * divides back exactly. Integral ids are required (the operator's
    * corpus-order contract needs an ordered id anyway); a null id never
    * wins a span (SQL min ignores null packed keys — the struct-min
    * spelling's NULLS FIRST ordering would instead let a null-id row
    * win and then reassemble NOTHING, dropping the span everywhere). */
  private def dedupAndRebuild(base: DataFrame, spans: DataFrame,
      idCol: String, k: Int): DataFrame = {
    val id = col(idCol)
    import org.apache.spark.sql.types._
    base.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"SpanDedup: id column $idCol must be integral (corpus order), " +
          s"got $other")
    }
    val two32 = lit(new java.math.BigDecimal(4294967296L))
    val packed = (id.cast(DecimalType(38, 0)) * two32 +
      col("span_idx").cast(DecimalType(38, 0))).as("p")
    val keptIdx = spans
      .groupBy(col("h"))
      .agg(min(packed).as("p"))
      .select((pmod(col("p"), two32)).cast("int").as("i"),
        ((col("p") - pmod(col("p"), two32)) / two32)
          .cast(base.schema(idCol).dataType).as(idCol))
      .groupBy(id)
      .agg(sort_array(collect_list(col("i"))).as("keep_idx"))
    base
      .join(keptIdx, Seq(idCol), "left")
      // null text ⇒ null ws/n_spans upstream: report 0 spans, empty text
      .select(id, coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(size(col("keep_idx")), lit(0)).cast("long").as("n_kept"),
        coalesce(
          array_join(
            transform(col("keep_idx"), i => spanText(col("ws"), i, k)),
            " "),
          lit("")).as("clean_text"))
  }

  /** Rows whose id is NULL cannot hold a corpus-order position, so they
    * do not participate in dedup at all: they pass through with every
    * span kept (`n_kept = n_spans`, `clean_text` = the full normalized
    * text) — the same null-key contract
    * [[graft.sim.Similarity.semanticDedup]] uses for null cluster ids.
    * (Without the explicit branch a null id would silently LOSE every
    * span — SQL min skips the null packed key — and reassemble to empty
    * text, and a span occurring only in null-id docs would vanish from
    * the corpus.) The branch is only planned when the id column is
    * nullable, so non-nullable pipelines keep the exact plan shape
    * PlanLintSpec pins. */
  private def nullIdPassthrough(df: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val ws = TextOps.tokens(col(textCol))
    val n = coalesce(
      floor((size(ws) + (k - 1)) / k.toDouble).cast("long"), lit(0L))
    df.filter(col(idCol).isNull)
      .select(col(idCol),
        n.as("n_spans"), n.as("n_kept"),
        coalesce(concat_ws(" ", ws), lit("")).as("clean_text"))
  }

  /** Per-document result: `n_spans`, `n_kept` (spans surviving corpus-level
    * dedup), and `clean_text` (the document rebuilt from surviving spans,
    * space-joined; empty when nothing survives). Documents whose text
    * normalizes to nothing still appear, with their single empty span
    * subject to the same first-occurrence rule. NULL-id documents do not
    * participate in dedup — they pass through with all spans kept (see
    * [[nullIdPassthrough]]); every non-null id must be integral (corpus
    * order), enforced loudly. */
  def clean(df: DataFrame, idCol: String, textCol: String, k: Int = 3)
      : DataFrame = {
    val part = if (df.schema(idCol).nullable)
      df.filter(col(idCol).isNotNull) else df
    val (base, spans) = spansOf(part, idCol, textCol, k)
    val deduped = dedupAndRebuild(base, spans, idCol, k)
    if (df.schema(idCol).nullable)
      deduped.unionByName(nullIdPassthrough(df, idCol, textCol, k))
    else deduped
  }

  /** Incremental form — the production shape for a continuously-ingested
    * corpus: dedup ONE batch against the accumulated span registry without
    * ever re-reading the lake. `registry` needs a single column `h` (the
    * 16-byte BINARY [[graft.functions.SpanHashes]] key — what [[SpanBatch.newSpans]]
    * emits; bucket-write it on `h` and the anti-join below consumes
    * bucketing exchange-free). A batch span survives iff its hash is NOT
    * in the registry (anti-join) AND it is the batch-first occurrence
    * (same winner rule as [[clean]]). Appending `newSpans` to the
    * registry makes consecutive batches equivalent to one [[clean]] over
    * their concatenation in batch order. NULL-id rows pass through with
    * all spans kept and contribute NOTHING to `newSpans` (they never
    * deduped, so registering their spans would let an orderless row
    * suppress later real occurrences) — same contract as [[clean]].
    * Never call an action on `cleaned`/`newSpans` twice without
    * persisting if the batch source is non-deterministic. */
  def incremental(batch: DataFrame, idCol: String, textCol: String,
      registry: DataFrame, k: Int = 3): SpanBatch = {
    val part = if (batch.schema(idCol).nullable)
      batch.filter(col(idCol).isNotNull) else batch
    val (base, spans) = spansOf(part, idCol, textCol, k)
    val fresh = spans.join(registry.select(col("h")), Seq("h"), "left_anti")
    val deduped = dedupAndRebuild(base, fresh, idCol, k)
    val cleaned = if (batch.schema(idCol).nullable)
      deduped.unionByName(nullIdPassthrough(batch, idCol, textCol, k))
    else deduped
    SpanBatch(cleaned, fresh.select(col("h")).distinct())
  }
}
