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
    * (via [[Banded64]]: 4 × 16-bit bands ⇒ exhaustive for maxHamming ≤ 3).
    * `maxBucket`/`strictBuckets` forward to [[Banded64.pairs]]'s hot-band
    * guard (constant-color thumbnails share band signatures). */
  def nearDupPairs(df: DataFrame, maxHamming: Int = 3,
      idCol: String = "media_id", mediaCol: String = "media",
      maxBucket: Int = 10000, strictBuckets: Boolean = false): DataFrame =
    Banded64.pairs(
      ImageOps.decodeImages(df, idCol, mediaCol)
        .filter(col("decoded"))
        .select(col("media_id"), col("ahash").as("fp")),
      maxHamming, maxBucket, strictBuckets)
}
