package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25)
  * ranking and a dense (embedding-cosine) ranking — the standard
  * two-tower retrieval composition (Cormack et al., SIGIR'09: score =
  * Σ 1/(k + rank), k = 60).
  *
  * Scale shape: each retriever independently produces a BOUNDED top-`kCand`
  * candidate list (BM25 via a TakeOrderedAndProject global top-k, cosine
  * via a broadcast query + per-query window), so the fusion stage only
  * ever sees ≤ 2·kCand rows regardless of corpus size. Ranks inside those
  * bounded lists are computed with a broadcast self-join count
  * (`1 + |{y : y beats x}|`) — never a single-partition window, so the
  * plan-lint contract holds even though the frames are tiny.
  *
  * Exactness contract: BM25 scores are fixed-point rounded before ranking
  * (see [[TfIdf.bm25]]); cosine is exact IEEE arithmetic (see
  * [[Similarity]]); the fused score `1/(k+ra) + 1/(k+rb)` is two exact
  * divisions and one sum of doubles, rounded at 6 for the oracle. A doc
  * absent from one list contributes 0 from that list and reports rank 0
  * (never NULL — keeps the result columns non-nullable int64 for the
  * driver's type-class hash).
  */
object Retrieval {

  /** Rank rows of a bounded scored frame `(id, score)` as
    * `1 + count(beats)` via a broadcast self-join — deterministic given a
    * duplicate-free score column tie-broken by id. Intended for frames
    * already bounded by a top-k (≤ a few hundred rows). */
  private[graft] def selfJoinRank(scored: DataFrame, idCol: String,
      scoreCol: String, rankName: String): DataFrame = {
    val x = scored.select(col(idCol).as("x_id"), col(scoreCol).as("x_s"))
    val y = scored.select(col(idCol).as("y_id"), col(scoreCol).as("y_s"))
    x.join(broadcast(y),
        col("y_s") > col("x_s") ||
          (col("y_s") === col("x_s") && col("y_id") < col("x_id")),
        "left")
      .groupBy(col("x_id"), col("x_s"))
      .agg((count(col("y_id")) + lit(1L)).as(rankName))
      .select(col("x_id").as(idCol), col(rankName))
  }

  /** Fuse two bounded ranked lists `(idCol, <rank>)` by RRF. Missing
    * entries contribute 0 and surface as rank 0. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      rankACol: String, rankBCol: String, kConst: Int = 60,
      limit: Int = 20): DataFrame = {
    require(kConst >= 1, s"RRF k must be >= 1, got $kConst")
    val joined = a.join(b, Seq(idCol), "full_outer")
    val ra = coalesce(col(rankACol), lit(0L)).as(rankACol)
    val rb = coalesce(col(rankBCol), lit(0L)).as(rankBCol)
    def contrib(r: org.apache.spark.sql.Column) =
      when(r > 0, lit(1.0) / (lit(kConst.toDouble) + r.cast("double")))
        .otherwise(lit(0.0))
    joined
      .select(col(idCol), ra, rb)
      .withColumn("rrf_score",
        round(contrib(col(rankACol)) + contrib(col(rankBCol)), 6))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(limit)
  }

  /** End-to-end hybrid search: BM25 over `docs(textCol)` for `queryTerms`
    * fused with brute-cosine neighbors of `queryVecId` in
    * `embs(embCol)`, ids joined on `docIdCol` = `vecIdCol`. Returns
    * `(doc_id, bm25_rank, cos_rank, rrf_score)`, top-`limit` by fused
    * score with doc-id tie-break. */
  def hybridSearch(docs: DataFrame, embs: DataFrame, docIdCol: String,
      textCol: String, vecIdCol: String, embCol: String,
      queryTerms: Seq[String], queryVecId: Long, kCand: Int = 50,
      kConst: Int = 60, limit: Int = 20): DataFrame = {
    val bmScored = TfIdf.bm25(docs, docIdCol, textCol, queryTerms,
      limit = kCand)
    val bmRanked = selfJoinRank(bmScored, docIdCol, "score", "bm25_rank")
    val cosRanked = Similarity.bruteForceTopK(embs,
        embs.filter(col(vecIdCol) === queryVecId), vecIdCol, embCol,
        k = kCand)
      .select(col("n_id").cast("long").as(docIdCol),
        col("rank").cast("long").as("cos_rank"))
    rrfFuse(bmRanked, cosRanked, docIdCol, "bm25_rank", "cos_rank",
      kConst, limit)
  }
}
