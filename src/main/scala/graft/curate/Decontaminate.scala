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

  /** One (id, shingle) row per distinct word n-gram of each document. The
    * words array is PROJECTED before shingling: `wordShingles`' lambda
    * references its input once per n-gram element, and an inlined
    * normalize+split expression would re-run the regex chain O(n·words)
    * times per document (measured 45 s for 5000 docs at sf0.1); behind a
    * projection boundary the array is computed once per row and the
    * lambda's `element_at`s are O(1) lookups (same run: 0.9 s). */
  private def shingleRows(df: DataFrame, idCols: Seq[Column], textCol: Column,
      n: Int): DataFrame =
    df.select(idCols :+ TextOps.tokens(textCol).as("__w"): _*)
      .select(idCols :+
        explode(array_distinct(TextOps.wordShingles(col("__w"), n))).as("__sh"): _*)

  /** One row per contaminated corpus document: its id and how many
    * distinct benchmark n-grams it shares. */
  def flagOverlaps(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"flagOverlaps: n must be >= 1, got $n")
    val corpusSh = shingleRows(corpus, Seq(col(idCol)), col(textCol), n)
    val benchSh = shingleRows(benchmark, Seq.empty, col(textCol), n)
      .select(col("__sh")).distinct()
    corpusSh.join(broadcast(benchSh), "__sh")
      .groupBy(col(idCol))
      .agg(count_distinct(col("__sh")).as("n_shared"))
  }
}
