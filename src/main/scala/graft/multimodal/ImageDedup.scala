package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate IMAGE detection: decode → 64-bit aHash fingerprint →
  * banded candidate generation → Hamming verification. The media analog of
  * the SimHash text path, built from the same scale pieces: banding makes
  * candidates a groupBy (never all-pairs), `bit_count(a ^ b)` is a
  * codegen'd builtin, and exact-duplicate hashes pre-collapse into one
  * banding representative like the text paths' canonical mapping.
  *
  * Pigeonhole: two hashes within Hamming distance d must agree on at least
  * one of `bands` equal bit-slices whenever d < bands, so `maxHamming = 3`
  * with 4 bands is exhaustive — no candidate is missed, the verify stage
  * only removes false positives. */
object ImageDedup {

  /** Pairs of decodable images whose aHashes are within `maxHamming` bits
    * (4 × 16-bit bands ⇒ exhaustive for maxHamming ≤ 3). */
  def nearDupPairs(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", mediaCol: String = "media"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"nearDupPairs: 4x16-bit bands are exhaustive only for maxHamming <= 3, got $maxHamming")
    val hashed = ImageOps.decodeImages(df, idCol, mediaCol)
      .filter(col("decoded"))
      .select(col("media_id"), col("ahash"))
    // one banding representative per distinct hash value: k identical
    // images otherwise flood every band bucket (the text paths' r2 lesson)
    val rep = hashed.groupBy(col("ahash")).agg(min(col("media_id")).as("rep"))
    val bands = (0 until 4).map { b =>
      rep.select(col("ahash"), col("rep"),
        lit(b).as("band"), shiftright(col("ahash"), b * 16).bitwiseAND(0xffffL).as("sig"))
    }.reduce(_ unionByName _)
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.ahash").as("h_a"), col("x.rep").as("rep_a"),
        col("y.ahash").as("h_b"), col("y.rep").as("rep_b"))
      .distinct()
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxHamming)
    // expand representatives back to members (identical hashes = Hamming 0)
    val members = hashed.select(col("ahash"), col("media_id"))
      .join(rep, "ahash").select(col("rep"), col("media_id"))
    val within = members.as("m").join(members.as("n"),
        col("m.rep") === col("n.rep") && col("m.media_id") < col("n.media_id"))
      .select(col("m.media_id").as("id_a"), col("n.media_id").as("id_b"),
        lit(0).as("hamming"))
    val cross = candidates
      .join(members.withColumnRenamed("rep", "rep_a"), "rep_a")
      .withColumnRenamed("media_id", "a")
      .join(members.withColumnRenamed("rep", "rep_b"), "rep_b")
      .withColumnRenamed("media_id", "b")
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int").as("hamming"))
    within.unionByName(cross)
  }
}
