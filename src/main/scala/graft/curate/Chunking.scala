package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Sliding-window chunking — the RAG/context-window prep stage: each
  * document splits into word windows of `window` tokens every `stride`
  * tokens (overlap = window − stride), each chunk carrying its doc id,
  * chunk index, and word offset so downstream joins can map retrieval hits
  * back to source positions. The last window starts at the final stride
  * position covering any tail (shorter tail chunks are kept — standard
  * chunker behavior, a truncating variant is a `where`).
  *
  * Scale shape: a single narrow explode (inflation = window/stride, the
  * overlap factor the caller chose) — no shuffle at all; chunk rows leave
  * the scan partition-local, ready for the embedding/mapInPandas stage.
  */
object Chunking {

  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val id = col(idCol)
    val base = df
      .select(id, TextOps.tokens(col(textCol)).as("ws"))
      .select(id, col("ws"),
        greatest(coalesce(size(col("ws")), lit(0)), lit(0)).as("n"))
    // number of windows: 1 + ceil(max(n - window, 0) / stride); zero-word
    // docs still yield one (empty-text) chunk so no document disappears.
    val nChunks = (lit(1)
      + ceil(greatest(col("n") - window, lit(0)).cast("double") / stride)
        .cast("int")).as("n_chunks")
    base.select(id, col("ws"), col("n"), nChunks)
      .select(id, col("n").cast("long").as("n_words"),
        posexplode(transform(sequence(lit(0), col("n_chunks") - 1), i =>
          struct((i * stride).cast("long").as("off"),
            concat_ws(" ",
              slice(col("ws"), (i * stride + 1).cast("int"), lit(window)))
              .as("chunk"))))
          .as(Seq("chunk_idx", "c")))
      .select(id, col("n_words"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.off").as("word_offset"), col("c.chunk").as("chunk"))
  }
}
