package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared near-dup engine over 64-bit media fingerprints (image aHash,
  * audio energy-hash, any future modality): exact-fingerprint pre-collapse
  * → 4×16-bit banded candidate generation → codegen'd `bit_count` Hamming
  * verification → member re-expansion. Pigeonhole makes 4 bands exhaustive
  * for Hamming ≤ 3; banding keeps candidates a groupBy, never all-pairs. */
object Banded64 {

  /** `hashed` must have columns (`media_id` long, `fp` long). Returns
    * (id_a, id_b, hamming) for every pair within `maxHamming`. */
  def pairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"Banded64: 4x16-bit bands are exhaustive only for maxHamming <= 3, got $maxHamming")
    // one banding representative per distinct fingerprint: k identical
    // media items otherwise flood every band bucket (the text paths' r2 lesson)
    val rep = hashed.groupBy(col("fp")).agg(min(col("media_id")).as("rep"))
    val bands = (0 until 4).map { b =>
      rep.select(col("fp"), col("rep"),
        lit(b).as("band"), shiftright(col("fp"), b * 16).bitwiseAND(0xffffL).as("sig"))
    }.reduce(_ unionByName _)
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.rep") < col("y.rep"))
      .select(col("x.fp").as("h_a"), col("x.rep").as("rep_a"),
        col("y.fp").as("h_b"), col("y.rep").as("rep_b"))
      .distinct()
      .filter(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= maxHamming)
    // expand representatives back to members (identical fingerprints = Hamming 0)
    val members = hashed.join(rep, "fp").select(col("rep"), col("media_id"))
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
