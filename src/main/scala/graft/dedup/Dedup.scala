package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash groupBy), exact n-gram Jaccard (all candidate
  * pairs), MinHash+LSH (banded signatures — the 100 TB path), SimHash.
  *
  * Scale design:
  *  - exact dedup is one shuffle on the fingerprint — optimal;
  *  - exact Jaccard joins docs on shared shingles: its cost is Σ(docs per
  *    shingle)², fine as a verifier on candidate pairs, quadratic as a
  *    global algorithm — NEVER run it all-pairs at scale;
  *  - [[minHashLsh]] is the scale path: k hash functions → banded
  *    signatures → candidates only from same-band buckets → exact-verify
  *    just those pairs. Cost is O(docs × k) + O(candidate pairs), no
  *    all-pairs term anywhere.
  */
object Dedup {

  /** Exact duplicate groups: canonical id + member count per fingerprint.
    * One hash-shuffle; partial aggregation makes the map side emit one row
    * per (partition, fingerprint). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Per-document distinct word-n-gram shingle sets, exploded to
    * (id, shingle) rows — the shared substrate of the Jaccard paths. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"),
      explode(array_distinct(TextOps.wordShingles(
        TextOps.words(TextOps.normalized(col(textCol))), n))).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle,
    * thresholded. Correct by construction; use on bounded candidate sets. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val a = sh.toDF("doc_a", "shingle")
    val b = sh.toDF("doc_b", "shingle")
    val inter = a.join(b, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: for each doc, the elementwise minimum of
    * `numHashes` independent 64-bit hashes over its shingle set.
    * Implemented as explode(hash-index) + min-aggregate — two shuffles on
    * (doc, i), both with map-side partial min. */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame =
    shingles
      .select(col("doc"), explode(sequence(lit(0), lit(numHashes - 1))).as("i"),
        col("shingle"))
      .withColumn("h", xxhash64(col("i"), col("shingle")))
      .groupBy(col("doc"), col("i"))
      .agg(min(col("h")).as("minhash"))

  /** MinHash + LSH banded candidate generation + exact verification.
    *
    * `numHashes = bands × rowsPerBand`. Two docs become candidates iff one
    * band's signature slice matches exactly; candidates are then verified
    * with true Jaccard on their shingle sets. With b=8, r=4 the capture
    * probability at J=0.9 is 1-(1-0.9⁴)⁸ ≈ 0.9998.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String, n: Int,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, n).cache()
    val sigs = minHashSignatures(sh, bands * rowsPerBand)

    // band signature: hash of the band's minhashes in row order
    val bandSigs = sigs
      .withColumn("band", (col("i") / lit(rowsPerBand)).cast("int"))
      .groupBy(col("doc"), col("band"))
      .agg(xxhash64(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("minhash")))),
          s => s.getField("minhash").cast("string")))).as("sig"))

    // same-band buckets → unordered candidate pairs (bounded by bucket size)
    val buckets = bandSigs.groupBy(col("band"), col("sig"))
      .agg(collect_set(col("doc")).as("docs"))
      .filter(size(col("docs")) > 1)
    val candidates = buckets
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()

    // exact-verify candidates only
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val aSh = sh.toDF("doc_a", "shingle")
    val bSh = sh.toDF("doc_b", "shingle")
    candidates
      .join(aSh, "doc_a").join(bSh, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
