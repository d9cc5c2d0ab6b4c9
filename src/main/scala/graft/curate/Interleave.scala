package graft.curate

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Weighted source interleaving (stride scheduling): give every document a
  * position such that reading the corpus in position order yields each
  * source at its target rate — the curriculum/mixture-ordering stage of a
  * training pipeline (e.g. 60% web, 30% code, 10% reference, maintained in
  * every prefix, not just in aggregate).
  *
  * The classic stride schedule: the i-th document of source s (1-based,
  * ordered by id) gets position `(i - 0.5) / w_s`. The per-source rank is
  * NOT a `Window.partitionBy(source)` — sources are few by construction
  * (web/code/reference…), so each window partition would be a near-global
  * single-task sort chain. Instead it uses the [[Packing]] two-pass
  * range-partition pattern, per source: range-repartition on
  * (source, id), sort within partitions, one lightweight job for
  * per-partition per-source counts (|partitions|·|sources| rows to the
  * driver), then a map-only pass threading each source's running rank
  * through the sorted partitions. Exact by construction, no global
  * window, one range exchange at 100 TB. */
object Interleave {

  /** Stride-schedule positions, one row per input row:
    * (`idCol`, `sourceCol`, `pos`). The output is NARROW — join it back on
    * `idCol` (unique by the curation pipeline's contract) when other
    * columns are needed. Weights are normalized; a source missing from
    * `weights` fails loudly rather than silently landing at infinity.
    * Note: runs Spark jobs eagerly at call time (the pass-1 count job),
    * like the other two-pass curation operators. */
  def byWeight(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "interleave: empty weight map")
    weights.foreach { case (k, v) =>
      require(v > 0, s"interleave: weight for '$k' must be > 0, got $v") }
    val total = weights.values.sum
    val norm = weights.map { case (k, v) => k -> v / total }
    val s = df.sparkSession

    val sorted = df
      .select(col(sourceCol).cast("string").as("__src"),
        col(idCol).cast("long").as("__id"))
      .repartitionByRange(col("__src"), col("__id"))
      .sortWithinPartitions("__src", "__id")
    val rdd = sorted
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .rdd
    // Pass 1: per-partition per-source counts. Same RDD object in both
    // passes, so the range partitioner's sampled boundaries are identical.
    val counts: Array[(Int, Map[String, Long])] =
      rdd.mapPartitionsWithIndex { case (i, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (src, _) => m.update(src, m.getOrElse(src, 0L) + 1L) }
        Iterator((i, m.toMap))
      }.collect()
    val missing = counts.iterator.flatMap(_._2.keys).toSet -- norm.keySet
    require(missing.isEmpty,
      s"interleave: source(s) ${missing.mkString("'", "', '", "'")} have " +
        "no weight — every source must be in the mixture")
    // exclusive per-source prefix: offsets(i)(src) = rows of src before partition i
    val byIdx = counts.sortBy(_._1).map(_._2)
    val offsets: Array[Map[String, Long]] = byIdx.scanLeft(Map.empty[String, Long]) {
      (acc, m) => m.foldLeft(acc) { case (a, (k, v)) =>
        a.updated(k, a.getOrElse(k, 0L) + v) }
    }.init
    val bcOff = s.sparkContext.broadcast(offsets)
    val bcW = s.sparkContext.broadcast(norm)
    // Pass 2: thread each source's running rank through its sorted runs.
    val positioned = rdd.mapPartitionsWithIndex { case (i, it) =>
      val run = scala.collection.mutable.HashMap.empty[String, Long]
      bcOff.value(i).foreach { case (k, v) => run.update(k, v) }
      val w = bcW.value
      it.map { case (src, id) =>
        val rank = run.getOrElse(src, 0L) + 1L
        run.update(src, rank)
        (id, src, (rank.toDouble - 0.5) / w(src))
      }
    }
    s.createDataset(positioned)(
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaDouble))
      .toDF(idCol, sourceCol, "pos")
  }
}
