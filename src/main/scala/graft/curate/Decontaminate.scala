package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Benchmark decontamination: flag corpus documents that share any word
  * n-gram with an evaluation/benchmark set — the train/test-overlap check
  * a training corpus must pass before release.
  *
  * Scale shape: the benchmark side is small by nature (eval sets), so its
  * distinct shingle set is BROADCAST; the corpus stream explodes to
  * shingles and is filtered map-side by the broadcast hash join — the only
  * exchange carries flagged (doc, shingle) hits, grouped per doc to count
  * distinct shared shingles. The corpus itself never shuffles, and docs
  * with no hit vanish at the join (the common case at 100 TB).
  */
object Decontaminate {

  /** Distinct word n-gram shingles of a text column (canonicalized). */
  private def shingles(textCol: Column, n: Int): Column =
    array_distinct(TextOps.wordShingles(TextOps.words(TextOps.normalized(textCol)), n))

  /** One row per contaminated corpus document: its id and how many
    * distinct benchmark n-grams it shares. */
  def flagOverlaps(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"flagOverlaps: n must be >= 1, got $n")
    val corpusSh = corpus.select(col(idCol),
      explode(shingles(col(textCol), n)).as("__sh"))
    val benchSh = benchmark.select(explode(shingles(col(textCol), n)).as("__sh"))
      .distinct()
    corpusSh.join(broadcast(benchSh), "__sh")
      .groupBy(col(idCol))
      .agg(count_distinct(col("__sh")).as("n_shared"))
  }
}
