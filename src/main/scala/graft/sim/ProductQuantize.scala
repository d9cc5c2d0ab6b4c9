package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A trained product quantizer: `m` codebooks of `ksub` centroids over
  * `subDim`-wide slices of the embedding. Driver-side by design — the whole
  * model is `m·ksub·subDim` doubles (4·16·16 = 4 KiB at the corpus shape),
  * the same "small enough to inline into every task" regime as
  * [[Similarity.withCentroidArray]]'s literal path; it ships to executors
  * as plan literals, never as a join side.
  *
  * `books(j)(c)` = (centroid subvector, its squared norm); `c` IS the dense
  * code in [0, ksub). */
case class PQModel(m: Int, subDim: Int,
    books: IndexedSeq[IndexedSeq[(Seq[Double], Double)]]) {
  require(books.length == m && books.forall(_.nonEmpty),
    s"PQModel: need $m non-empty codebooks, got ${books.map(_.length)}")
  /** nrm2 lookup tables as a plan literal: nrm2Lit(j+1)(c+1). */
  private[sim] def nrm2Lit: Column =
    typedlit(books.map(_.map(_._2)))
}

/** Product quantization for embedding search at memory scale (Jégou,
  * Douze, Schmid, *Product Quantization for Nearest Neighbor Search*,
  * TPAMI 2011): split each D-dim vector into `m` subvectors, k-means each
  * subspace independently (`ksub` codes), and store each vector as `m`
  * small codes — 64 float32 (256 B) compress to 4 codes (≤ 4 B of code
  * space), a 32–64× in-memory index reduction, which is what lets a
  * 100 TB corpus's ANN index fit a cluster's RAM at all. Search is
  * asymmetric distance computation (ADC): the query stays exact, each
  * corpus vector is scored through per-query lookup tables of
  * query-subvector · centroid products.
  *
  * Spark shape: training reuses [[Similarity.kmeansCentroids]] per
  * subspace (each Lloyd step one corpus pass, partial-agg means);
  * [[ProductQuantize.encode]] is a single narrow projection (m inlined
  * argmax's, no shuffle, whole-stage codegen); [[ProductQuantize.adcTopK]]
  * builds the per-query LUT relationally (queries × m·ksub literal rows —
  * tiny), broadcasts it, and scores codes with two array folds per
  * (vector, query) pair — m table lookups instead of a D-wide dot product,
  * PQ's constant-factor win, shuffle-free until the bounded per-query
  * top-k. Everything is deterministic given the corpus (hash-seeded
  * k-means), so re-runs and recall checks are reproducible. */
object ProductQuantize {

  /** Train `m` subspace codebooks of `ksub` centroids each. `dim` must be
    * divisible by `m`; vectors shorter than `dim` fail in the slice/dot.
    * Codes are densified to [0, ksub) in centroid-id order, so the model
    * is stable across runs. Cost: m × (iterations + 1) corpus passes, each
    * narrow + one |centroids|-sized partial agg. */
  def train(corpus: DataFrame, idCol: String, embCol: String, dim: Int,
      m: Int, ksub: Int, iterations: Int = 2): PQModel = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(ksub >= 1, s"ksub must be >= 1, got $ksub")
    val subDim = dim / m
    val books = (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(embCol), j * subDim + 1, subDim).as(embCol))
      Similarity.kmeansCentroids(sub, idCol, embCol, ksub)
        .orderBy(col(idCol)) // ≤ ksub rows: dense-code order is centroid-id order
        .collect()
        .toIndexedSeq
        .map { r =>
          val e = r.getSeq[Double](1)
          (e, e.map(x => x * x).sum)
        }
    }
    PQModel(m, subDim, books)
  }

  /** Quantize every vector to its `m` codes: one narrow projection through
    * the [[graft.functions.PqEncode]] kernel — m inlined argmins of L2
    * distance to the subspace centroids (computed as argmax of
    * `x·c − ‖c‖²/2`; ties to the smaller code), with the flat codebook as
    * a primitive `double[]` plan constant and the whole row inside
    * whole-stage codegen. (The round-8 composed form — a `transform` over
    * an array-of-struct literal folded through `array_max` — computed the
    * same codes but paid ~187 µs/vector in interpreted struct traversal;
    * the kernel is the same arithmetic at primitive-loop cost.)
    * Output: (idCol, `codes` array<long>). */
  def encode(corpus: DataFrame, idCol: String, embCol: String,
      model: PQModel): DataFrame = {
    // The kernel wants a rectangular m × ksub codebook; k-means can return
    // fewer centroids for a subspace (an emptied cluster drops out of the
    // mean groupBy). Pad short subspaces by REPEATING centroid 0 at the
    // tail: the argmax keeps the smaller code on equal score, so a padded
    // duplicate can never win and the codes are identical to the
    // variable-length semantics.
    model.books.zipWithIndex.foreach { case (b, j) =>
      require(b.nonEmpty,
        s"PQModel codebook for subspace $j is empty — k-means returned no " +
          "centroids (corpus slice all-null or empty?); cannot encode")
    }
    val ksub = model.books.map(_.length).max
    def padded(j: Int) =
      model.books(j) ++ Seq.fill(ksub - model.books(j).length)(model.books(j).head)
    val booksFlat = typedlit((0 until model.m).flatMap(j => padded(j).flatMap(_._1)))
    val nrm2Flat = typedlit((0 until model.m).flatMap(j => padded(j).map(_._2)))
    import org.apache.spark.sql.graft.ColumnBridge
    corpus.select(col(idCol),
      ColumnBridge.column(graft.functions.PqEncode(
        ColumnBridge.expression(col(embCol)),
        ColumnBridge.expression(booksFlat),
        ColumnBridge.expression(nrm2Flat),
        ColumnBridge.expression(lit(model.m)),
        ColumnBridge.expression(lit(ksub)))).as("codes"))
  }

  /** ADC top-k: rank the encoded corpus against each query by approximate
    * cosine — `Σ_j lut_q[j][code_j] / (‖q‖ · ‖x̂‖)` where `x̂` is the
    * reconstruction (‖x̂‖² = Σ_j ‖c_{j,code_j}‖², exact from the model) —
    * and keep each query's top `k` (ties to the smaller neighbor id).
    * `queries` must be small enough to broadcast with their LUTs
    * (m·ksub doubles per query); the corpus side is one narrow scoring
    * projection over the CODES (m array lookups per pair, the D-wide dot
    * never runs) plus the per-query bounded top-k window. */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, model: PQModel, k: Int): DataFrame = {
    val lutPerSub = (0 until model.m).map { j =>
      val qsub = slice(col(embCol), j * model.subDim + 1, model.subDim)
      transform(typedlit(model.books(j)),
        c => Similarity.dot(qsub, c.getField("_1")))
    }
    val q = queries.select(col(idCol).as("q_id"),
      Similarity.l2Norm(col(embCol)).as("q_norm"),
      array(lutPerSub: _*).as("__lut"))
    val ip = aggregate(
      transform(col("codes"), (c, j) =>
        element_at(element_at(col("__lut"), j + 1), c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)
    val recon2 = aggregate(
      transform(col("codes"), (c, j) =>
        element_at(element_at(model.nrm2Lit, j + 1), c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    encoded.select(col(idCol).as("n_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("score", ip / (col("q_norm") * sqrt(recon2)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("score"))
  }

  /** The production PQ pipeline (IVFADC's re-rank stage): ADC over the
    * codes produces a `shortlist`-sized candidate set per query, then ONLY
    * those candidates are re-ranked with exact cosine against the full
    * vectors. ADC distortion caps how finely 8–16 bytes can rank a
    * neighborhood (quantization error is on the order of fine cosine
    * gaps), so ADC alone is a coarse filter; re-ranking restores exact
    * order within the shortlist, and recall@k is then the probability the
    * true neighbors reach the shortlist at all — large by construction
    * when `shortlist >> k`.
    *
    * Scale shape: the exact D-wide dot runs on queries × shortlist rows
    * (bounded, broadcast-joined back to the corpus scan — the corpus side
    * is one broadcast hash semi-join, no shuffle), not on the whole
    * corpus; the corpus-wide work stays the m-lookup ADC scan. */
  def adcTopKRerank(corpus: DataFrame, encoded: DataFrame,
      queries: DataFrame, idCol: String, embCol: String, model: PQModel,
      k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = adcTopK(encoded, queries, idCol, embCol, model, shortlist)
      .select(col("q_id"), col("n_id"))
    val qv = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
      Similarity.l2Norm(col(embCol)).as("q_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"),
        Similarity.l2Norm(col(embCol)).as("n_norm"))
      .join(broadcast(cand), "n_id")
      .join(broadcast(qv), "q_id")
      .withColumn("cosine", Similarity.cosine(col("q_emb"), col("n_emb"),
        col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("cosine"))
  }
}
