package graft.curate

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling: assign every document a pseudo-random
  * training position that is stable across runs and engines — the "shuffle
  * the dataset before epoch 0" stage, without `rand()`'s non-reproducibility.
  *
  * Position = rank of `(md5-bucket(id), id)`. Ranking is the q35/packing
  * pattern: range-repartition on the sort key (so partition i wholly
  * precedes partition i+1), sort within partitions, then `zipWithIndex` —
  * one lightweight count job plus a map, never a single-partition global
  * window. At 100 TB this is one range exchange, the same cost as any
  * global sort, and the output pairs are narrow (id, pos). */
object Shuffle {

  final case class ShuffledDoc(doc_id: Long, shuffle_pos: Long)

  def deterministicOrder(df: DataFrame, idCol: String): Dataset[ShuffledDoc] = {
    val s = df.sparkSession
    val keyed = df
      .select(col(idCol).cast("long").as("__id"))
      .withColumn("__b", Sampling.bucket32(col("__id")))
      .repartitionByRange(col("__b"), col("__id"))
      .sortWithinPartitions("__b", "__id")
      .as[(Long, Long)](Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val positioned = keyed.rdd.zipWithIndex().map { case ((id, _), pos) =>
      ShuffledDoc(id, pos)
    }
    s.createDataset(positioned)(Encoders.product[ShuffledDoc])
  }
}
