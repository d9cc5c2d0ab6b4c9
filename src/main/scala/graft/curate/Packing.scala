package graft.curate

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: lay the corpus out as
  * one token stream in a deterministic document order and cut it into
  * fixed-budget context windows ("concatenate and cut" — each document is
  * assigned to the pack where its first token lands; long documents simply
  * span boundaries, exactly like pretraining batch packing).
  *
  * The assignment needs a GLOBAL running token offset, which naively is
  * `Window.orderBy` with no partitionBy — the whole corpus through one
  * core. This implementation computes the same exact prefix sum the
  * scalable way (the [[graft.queries.CdcQueries.chunked]] pattern):
  * range-repartition on the order key, sort within partitions, one
  * lightweight job for per-partition token totals (|partitions| rows to
  * the driver), then a map-only pass that threads the broadcast partition
  * offsets through each partition's running sum. No global window, no
  * shuffle beyond the range exchange, exact by construction — the DuckDB
  * oracle's window cumsum must match bit for bit.
  */
object Packing {

  /** One packed document: its token count, its first token's global
    * offset, and the context window (`pack_id`) that offset falls in. */
  final case class PackedDoc(
      doc_id: Long, n_tokens: Long, tok_start: Long, pack_id: Long)

  /** Pack documents ordered by `idCol` into `budget`-token windows.
    * `tokensCol` must be a non-negative per-document token count (a size —
    * e.g. [[graft.text.TextOps.tokenCountRe]]). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long): Dataset[PackedDoc] = {
    require(budget >= 1, s"packSequences: budget must be >= 1, got $budget")
    val s = df.sparkSession
    val sorted = df
      .select(col(idCol).cast("long").as("__id"), tokensCol.cast("long").as("__tok"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions("__id")
    val rdd = sorted
      .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .rdd
    // Pass 1: per-partition token totals. Bounded driver traffic: one pair
    // per partition. Same RDD object in both passes, so the range
    // partitioner's sampled boundaries (seeded by RDD id) are identical.
    if (rdd.getNumPartitions > 1000000)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"packSequences: ${rdd.getNumPartitions} partitions — pass 1 " +
          "collects one token total per partition to the driver; beyond " +
          "~1e6 partitions coalesce the input or raise maxPartitionBytes")
    val totals = rdd.mapPartitionsWithIndex { case (i, it) =>
      var t = 0L
      it.foreach { case (_, tok) =>
        require(tok >= 0, s"packSequences: negative token count $tok")
        t += tok
      }
      Iterator((i, t))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = s.sparkContext.broadcast(offsets)
    // Pass 2: thread the running sum through each sorted partition.
    val packed = rdd.mapPartitionsWithIndex { case (i, it) =>
      var run = bc.value(i)
      it.map { case (id, tok) =>
        val start = run
        run += tok
        PackedDoc(id, tok, start, start / budget)
      }
    }
    s.createDataset(packed)(Encoders.product[PackedDoc])
  }
}
