package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One incremental SemDeDup step: `kept` — the batch rows surviving the
  * sweep (original schema) — and `newMembers`, the per-cluster
  * (cluster, nrm, emb) rows of ALL batch members (kept and dropped), to
  * be appended to the registry for the next batch. */
case class SemDedupBatch(kept: DataFrame, newMembers: DataFrame)

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via a broadcast cross join
  *    with the (small) query set. Cost O(|corpus| × |queries|): the correct
  *    baseline, and fine whenever |queries| is bounded;
  *  - [[ivfTopK]] — the scale path: k-means centroids
  *    ([[kmeansCentroids]]) turn the corpus into an inverted file
  *    (cluster → members); each query probes only its nProbe nearest
  *    clusters, so per-query cost drops by ~nCentroids/nProbe. The
  *    assignment is a narrow per-row argmax over the inlined centroid
  *    array — no join, no shuffle, no all-pairs stage anywhere.
  *
  * All arithmetic is float→double casts + sequential double sums, matching
  * the DuckDB oracle's `list_sum(list_transform(...))` bit for bit.
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays — the native
    * codegen'd [[graft.functions.FloatDot]] expression, constructed
    * directly so it works on a PLAIN session (no GraftExtensions needed;
    * the SQL registry's `vec_dot` is just the SQL spelling). Bit-identical
    * to the composed `aggregate(zip_with(...))` form it replaced, without
    * the per-row interpreted lambdas and intermediate array. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.FloatDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query vector (self excluded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
      .withColumn("n_norm", l2Norm(col("n_emb")))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", l2Norm(col("q_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        cosine(col("q_emb"), col("n_emb"), col("q_norm"), col("n_norm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("cosine"))
  }

  /** Exact embedding-cosine near-dup pairs: every unordered pair above the
    * threshold. O(n²) — the oracle/verifier shape; the scale path is
    * [[cosineNearDupClustered]]. */
  def cosinePairsExact(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), col(embCol).as("e"))
      .withColumn("nrm", l2Norm(col("e")))
    val a = v.select(col("id").as("id_a"), col("e").as("e_a"), col("nrm").as("n_a"))
    val b = v.select(col("id").as("id_b"), col("e").as("e_b"), col("nrm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("e_a"), col("e_b"), col("n_a"), col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding-cosine near-dup at scale: centroid-bucket the corpus once,
    * generate candidate pairs only WITHIN a bucket, exact-verify those.
    * Cost O(n·C) for assignment + Σ(bucket²) for pairs — no global n²
    * stage (expected pair cost ~ (nProbe²/C)·n²; pick C ≈ √n at scale so
    * the whole operator is ~n^1.5).
    *
    * `nProbe` is the recall knob: each vector joins its `nProbe` nearest
    * buckets ([[assignClustersMulti]]), so a pair survives if the two
    * top-probe sets intersect anywhere. nProbe=1 is the cheapest/lossiest
    * (a pair split across bucket boundaries is missed); on the corpus's
    * planted-cluster embeddings nProbe=3 of 8 centroids is recall-TOTAL at
    * τ=0.44 (suite-asserted equal to [[cosinePairsExact]], and driver-
    * oracled against the exact-pair SQL as q54). A pair sharing several
    * probed buckets is deduplicated; cosine is recomputed bit-identically
    * on every copy so `distinct` is exact. */
  def cosineNearDupClustered(corpus: DataFrame, idCol: String, embCol: String,
      threshold: Double, nCentroids: Int, nProbe: Int = 1): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, embCol, nCentroids)
    val assigned = assignClustersMulti(corpus, centroids, idCol, embCol, nProbe)
      .select(col(idCol).as("id"), col(embCol).as("e"), col("cluster"))
      .withColumn("nrm", l2Norm(col("e")))
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("e").as("e_a"), col("nrm").as("n_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("e").as("e_b"), col("nrm").as("n_b"))
    a.join(b, "cluster")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("e_a"), col("e_b"), col("n_a"), col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }

  /** Data-aware deterministic centroids: seed with a spread hash-sample of
    * the corpus (rank by `xxhash64(id)` — r2's first-N-by-id seeds collapse
    * recall whenever ids track insertion order, which they always do), then
    * refine with `iterations` Lloyd steps using the two-phase [[VectorMean]]
    * aggregate. Each step is ONE corpus pass: narrow argmax assignment +
    * partial-agg group means; the centroid frame is eagerly checkpointed per
    * step so the loop's lineage stays flat. Clusters that lose all members
    * drop (standard k-means), so callers get ≤ nCentroids rows. Returns
    * (idCol, embCol) with double-precision embeddings. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, embCol: String,
      nCentroids: Int, iterations: Int = 2): DataFrame = {
    var centroids = corpus
      .select(col(idCol), transform(col(embCol), x => x.cast("double")).as(embCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids)
      .localCheckpoint(true)
    for (_ <- 1 to iterations)
      centroids = assignClusters(corpus, centroids, idCol, embCol)
        .groupBy(col("cluster"))
        .agg(VectorMean.column(col(embCol)).as(embCol))
        .select(col("cluster").as(idCol), col(embCol))
        .localCheckpoint(true)
    centroids
  }

  /** Assign every corpus vector to its nearest centroid (IVF build step).
    *
    * Both regimes are the SAME per-row narrow argmax over the full centroid
    * array — no join key, no shuffle, no window — so every corpus row
    * (duplicate or null ids included) gets exactly one assignment and the
    * output cardinality is continuous across the regime boundary (ADVICE
    * r4: the old fallback's per-id window silently collapsed duplicate-id
    * rows). What changes above `inlineLimit` is only HOW the array reaches
    * the executors: up to the limit it is collected once and inlined as a
    * literal; past it an inlined literal would bloat every task's
    * serialized plan/codegen (ADVICE r3), so the array travels as a
    * one-row broadcast frame (collect_list of the centroid set) cross-
    * joined in — one broadcast exchange, still no shuffle of the corpus.
    *
    * Requires numeric centroid ids: ids are cast to long for the `cluster`
    * values, and a null/non-castable id or null embedding fails loudly on
    * both paths (the collect-side require below inline, a distributed
    * raise_error beyond it); ties go to the smaller centroid id. */
  def assignClusters(corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, inlineLimit: Int = 1024): DataFrame =
    // argmax over array<struct<_1:cid,_2:emb,_3:nrm>>: array_max orders by
    // (sim, -cid), so ties resolve to the smaller centroid id
    withCentroidArray(corpus, centroids, idCol, embCol, inlineLimit) { cents =>
      -array_max(scoredCentroids(cents, embCol)).getField("negid")
    }.withColumnRenamed("__res", "cluster")

  /** Multi-probe assignment: one output row per (corpus row, probed
    * cluster), `nProbe` nearest centroids each. The recall knob for
    * [[cosineNearDupClustered]] — same two shipping regimes and the same
    * narrow per-row evaluation as [[assignClusters]] (a per-row
    * sort-by-similarity replaces the argmax; O(C log C) per row). Ties
    * resolve toward smaller centroid ids, so the probe set is
    * deterministic. */
  def assignClustersMulti(corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, nProbe: Int,
      inlineLimit: Int = 1024): DataFrame = {
    require(nProbe >= 1, s"assignClustersMulti: nProbe must be >= 1, got $nProbe")
    withCentroidArray(corpus, centroids, idCol, embCol, inlineLimit) { cents =>
      // ascending (sim, negid) sort ⇒ the last nProbe entries are the top
      // probes, ties to the smaller centroid id. nProbe is clamped to the
      // centroid count per row: k-means may return fewer live centroids
      // than requested, and slice() errors when |start| exceeds the array
      // size rather than truncating.
      val p = least(lit(nProbe), size(cents))
      transform(slice(array_sort(scoredCentroids(cents, embCol)), -p, p),
        s => -s.getField("negid"))
    }.withColumn("cluster", explode(col("__res"))).drop("__res")
  }

  /** (sim, -cid) score structs for every centroid in `cents`, against the
    * current row's `embCol` (expects `__norm` bound by the caller). */
  private def scoredCentroids(cents: Column, embCol: String): Column =
    transform(cents, c =>
      struct(
        (dot(col(embCol), c.getField("_2")) /
          (col("__norm") * c.getField("_3"))).as("sim"),
        (-c.getField("_1")).as("negid")))

  /** Broadcast-path ceiling on total centroid payload (count × dim double
    * elements). One collect_list row materializes the whole set on the
    * driver and per-executor, so past ~2^27 elements (~1 GiB of vector
    * data) fail loudly with guidance instead of an opaque executor OOM. */
  private[graft] val broadcastCentroidElemCap: Long = 1L << 27

  /** Inline-literal ceiling (elements, ~32 MB of doubles): an inlined
    * centroid array is serialized into EVERY task's plan and codegen, so
    * its budget is far tighter than the broadcast's. A centroid set under
    * `inlineLimit` rows but over this payload routes to the broadcast
    * regime instead (regime selection by payload, not row count alone —
    * high-dimensional embeddings hit bytes long before rows). */
  private[graft] val inlineCentroidElemCap: Long = 1L << 22

  /** Shared centroid-array plumbing for [[assignClusters]] /
    * [[assignClustersMulti]]: validates the centroid contract, binds
    * `__norm` on the corpus, ships the prepped centroid array either as an
    * inline literal (≤ inlineLimit rows) or as a one-row broadcast, and
    * evaluates `result` (a per-row expression over the array) as `__res`.
    * No join key, no shuffle of the corpus on either path. */
  private[graft] def withCentroidArray(corpus: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, inlineLimit: Int,
      broadcastElemCap: Long = broadcastCentroidElemCap)
      (result: Column => Column): DataFrame = {
    val centPrepped = centroids
      .select(col(idCol).cast("long").as("cid"),
        transform(col(embCol), x => x.cast("double")).as("emb"))
      .withColumn("nrm", l2Norm(col("emb")))
    val centRows = centPrepped.limit(inlineLimit + 1).collect()
    require(centRows.nonEmpty, "assignClusters: empty centroid set")
    centRows.zipWithIndex.foreach { case (r, i) =>
      require(!r.isNullAt(0),
        s"assignClusters: centroid #$i has a null/non-numeric '$idCol' — " +
          "centroid ids must cast cleanly to long")
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"assignClusters: centroid #$i has a null '$embCol'")
    }
    val dim = centRows.head.getSeq[Double](1).length
    require(dim > 0, "assignClusters: centroid embeddings must be non-empty")
    if (centRows.length <= inlineLimit &&
        centRows.length.toLong * dim <= inlineCentroidElemCap) {
      val centLit = typedlit(centRows
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))))
      corpus.withColumn("__norm", l2Norm(col(embCol)))
        .withColumn("__res", result(centLit))
        .drop("__norm")
    } else {
      // the collect-side guard above only saw the first inlineLimit+1 rows,
      // so re-assert the whole contract distributedly before folding the
      // set into one broadcast row — and refuse payloads that would
      // silently blow the broadcast/row-size ceiling (VERDICT r5). The
      // pre-flight probe scans at most capRows+1 centroid rows (limit
      // short-circuits), not the whole frame, so an un-materialized
      // centroid input is not computed twice in full.
      val capRows = broadcastElemCap / dim
      val over = centPrepped.select(lit(1).as("__one"))
        .limit((capRows + 1).min(Int.MaxValue.toLong).toInt).count() > capRows
      require(!over,
        s"assignClusters: centroid payload exceeds $capRows rows × $dim " +
          s"dims = $broadcastElemCap double elements (the one-row " +
          "broadcast ceiling). Reduce the centroid count/dimension, or " +
          "shard the assignment (e.g. coarse-quantize first and assign " +
          "within shards).")
      def asserted(c: Column, what: String): Column =
        coalesce(c, raise_error(lit(
          s"assignClusters: centroid with a null/non-numeric $what — " +
            "centroid ids must cast cleanly to long and embeddings be " +
            "non-null")))
      val centArr = centPrepped
        .select(struct(
          asserted(col("cid"), s"'$idCol'").as("_1"),
          asserted(col("emb"), s"'$embCol'").as("_2"),
          asserted(col("nrm"), s"norm('$embCol')").as("_3")).as("c"))
        .agg(collect_list(col("c")).as("__cents"))
      corpus.withColumn("__norm", l2Norm(col(embCol)))
        .crossJoin(broadcast(centArr))
        .withColumn("__res", result(col("__cents")))
        .drop("__norm", "__cents")
    }
  }

  /** Approximate top-k: probe the `nProbe` clusters nearest to each query,
    * exact-rank only their members. Deterministic given the centroid set. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, embCol, nCentroids)
    val indexed = assignClusters(corpus, centroids, idCol, embCol)
      .select(col(idCol).as("n_id"), col(embCol).as("n_emb"), col("cluster"))
      .withColumn("n_norm", l2Norm(col("n_emb")))

    val cent = centroids.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
      .withColumn("c_norm", l2Norm(col("c_emb")))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", l2Norm(col("q_emb")))
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("__sim").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("__sim",
        cosine(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_norm"),
        col("c_id").as("cluster"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id"))
    indexed.join(broadcast(probes), "cluster")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        cosine(col("q_emb"), col("n_emb"), col("q_norm"), col("n_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication — drop documents whose embeddings are near-duplicates
    * within a cluster, keeping the member LEAST similar to the cluster
    * centroid (the paper's diversity-preserving choice). Runs on a
    * PRE-ASSIGNED cluster column, exactly as the paper runs on
    * precomputed k-means assignments ([[kmeansCentroids]] +
    * [[assignClusters]] provide one when absent); pairwise work
    * materializes only WITHIN clusters — Σ(cluster²), never n², the
    * paper's whole point at corpus scale.
    *
    * Reference rule, reproduced exactly: rank each cluster's members
    * ascending by (cosine-to-centroid, id); member b is dropped iff SOME
    * earlier-ranked a has cos(a, b) ≥ tau — the greedy scan is against
    * ALL earlier members, dropped or not, matching the reference
    * implementation's boolean-matrix sweep. Deterministic: every
    * comparison is a double computed by the same sequential float→double
    * dot both engines spell identically; rank flips would need two
    * DISTINCT embeddings' centroid-cosines within ~1e-15 (identical
    * embeddings tie exactly and break by id).
    *
    * Scale shape: one VectorMean aggregate for centroids (two-phase,
    * partial-agg'd), one join back (centroid side is |clusters| rows —
    * unhinted: AQE broadcasts while it fits, and the shuffle fallback
    * co-locates on the cluster key the groupBy reuses), one
    * collect-per-cluster shuffle where each embedding
    * crosses EXACTLY ONCE, the O(m²) greedy sweep run locally per group
    * by the native [[graft.functions.SemDedupDrops]] kernel (early-break;
    * rank order computed in-kernel, so no window), one anti-join on the
    * dropped ids. The declarative within-cluster pair join this replaced
    * shuffled |cluster|² rows each carrying two embedding arrays (~6 GB
    * at the q147 bench's 12M pairs); this shape's shuffle is linear in
    * the corpus. `maxCluster` is the loud-failure knob (the LSH family's
    * maxBucket): a cluster beyond it means the pre-clustering k is wrong
    * for the corpus — refuse clearly rather than grind O(m²) or OOM the
    * collected group. NULL cluster ids pass through UNDEDUPED (the
    * centroid equi-join drops null keys in both this plan and the SQL
    * oracle's spelling — engine-agreed "unassigned docs are kept";
    * run [[assignClusters]] first if they must participate). Returns
    * the kept rows of `corpus`, original schema. */
  def semanticDedup(corpus: DataFrame, idCol: String, embCol: String,
      clusterCol: String, tau: Double,
      maxCluster: Int = 200 * 1000): DataFrame = {
    val v = corpus.select(col(clusterCol).as("__c"), col(idCol).as("__id"),
        col(embCol).as("__e"))
      .withColumn("__nrm", l2Norm(col("__e")))
    val cent = v.groupBy(col("__c"))
      .agg(VectorMean.column(col("__e")).as("__ce"))
      .withColumn("__cnrm", l2Norm(col("__ce")))
    // no broadcast hint: the centroid side grows with the cluster count
    // (∝ corpus in the SemDeDup regime), so a forced broadcast would OOM
    // the driver at scale. AQE broadcasts while it fits; the shuffle-join
    // fallback co-locates on __c and is REUSED by the groupBy below, so
    // either plan ships each embedding through exactly one exchange (the
    // PlanLintSpec property).
    val members = v.join(cent, "__c")
      .withColumn("__csim",
        cosine(col("__e"), col("__ce"), col("__nrm"), col("__cnrm")))
      .groupBy(col("__c"))
      .agg(collect_list(struct(col("__id"), col("__csim"), col("__nrm"),
        col("__e"))).as("__ms"))
    val dropsCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SemDedupDrops(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__ms")),
        tau, maxCluster))
    val dropped = members.select(explode(dropsCol).as("__id"))
    corpus.join(dropped, corpus(idCol) === dropped("__id"), "left_anti")
  }

  /** Incremental SemDeDup — the production shape for a continuously-
    * ingested corpus: dedup ONE batch of embeddings against the
    * accumulated per-cluster member registry, without re-reading or
    * re-deciding anything already ingested.
    *
    * The semantics are the batch rule with rank = (ARRIVAL, csim, id):
    * every registry member outranks every batch member; within the batch
    * the order is [[semanticDedup]]'s (csim to the FIXED `centroids`,
    * id). Registry decisions are immutable — a batch member can never
    * drop a registry member — and the registry carries ALL prior members
    * (kept AND dropped: the paper's sweep counts dropped earlier members,
    * so forgetting them would change later batches). Appending
    * `newMembers` after each call makes consecutive calls EQUIVALENT to
    * one pass over the concatenation with that rank — the prefix
    * property q148's oracle pins cross-engine.
    *
    * `centroids` are the one-time k-means assignment's, passed in fixed
    * ([[kmeansCentroids]] output: one row per cluster, columns
    * (`clusterCol`, `embCol`)) — recomputing them per batch would
    * reorder history. `registry` needs columns (`clusterCol`, `nrm`,
    * `embCol`) — exactly what `newMembers` emits (ids are not needed:
    * registry members never re-sweep each other and their internal order
    * cannot affect the batch); pass an empty frame on the first call.
    * Per cluster the sweep costs O(|registry|·|batch| + |batch|²) in the
    * native [[graft.functions.SemDedupSweep]] kernel — registry members
    * are seeds, never re-paired among themselves — and each embedding
    * still crosses exactly one exchange. `maxCluster` bounds
    * |registry| + |batch| per cluster, loudly. NULL cluster ids pass
    * through undeduped and never enter `newMembers` (the batch form's
    * contract — assign clusters first if they must participate). */
  def semanticDedupIncremental(batch: DataFrame, idCol: String,
      embCol: String, clusterCol: String, centroids: DataFrame,
      registry: DataFrame, tau: Double,
      maxCluster: Int = 200 * 1000): SemDedupBatch = {
    // null cluster ids pass through undeduped and never enter the
    // registry — the batch form's contract; grouping them would sweep
    // every unassigned doc against every other (one unbounded
    // pseudo-cluster)
    val v = batch.select(col(clusterCol).as("__c"), col(idCol).as("__id"),
        col(embCol).as("__e"))
      .filter(col("__c").isNotNull)
      .withColumn("__nrm", l2Norm(col("__e")))
    val cent = centroids.select(col(clusterCol).as("__c"),
        col(embCol).as("__ce"))
      .withColumn("__cnrm", l2Norm(col("__ce")))
    // unhinted for the same reason as [[semanticDedup]]: |centroids| ∝
    // corpus in the SemDeDup regime; AQE broadcasts while small. LEFT
    // join: a batch cluster absent from the fixed centroids must still
    // dedup (null csim just ranks its members by id) — an inner join
    // would silently exempt the whole cluster from the sweep.
    val members = v.join(cent, Seq("__c"), "left")
      .withColumn("__csim",
        cosine(col("__e"), col("__ce"), col("__nrm"), col("__cnrm")))
      .groupBy(col("__c"))
      .agg(collect_list(struct(col("__id"), col("__csim"), col("__nrm"),
        col("__e"))).as("__ms"))
    val seeds = registry.select(col(clusterCol).as("__c"),
        col("nrm").cast("double").as("__snrm"), col(embCol).as("__se"))
      .groupBy(col("__c"))
      .agg(collect_list(struct(col("__snrm"), col("__se"))).as("__ss"))
    val sweepCol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SemDedupSweep(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__ms")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__ss")),
        tau, maxCluster))
    val dropped = members.join(seeds, Seq("__c"), "left")
      .select(explode(sweepCol).as("__id"))
    val kept = batch.join(dropped, batch(idCol) === dropped("__id"),
      "left_anti")
    val newMembers = v.select(col("__c").as(clusterCol),
      col("__nrm").as("nrm"), col("__e").as(embCol))
    SemDedupBatch(kept, newMembers)
  }
}
