package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Fixed-size blocked Bloom filter built as a typed [[Aggregator]] over
  * pre-hashed keys — the write-side half of the versioned table's per-file
  * key index ([[graft.sink.FileStatsIndex]]).
  *
  * The input is the key's `xxhash64` (computed IN the frame by Spark's
  * codegen'd `xxhash64` function, so the scan side stays whole-stage);
  * the aggregator only does bit arithmetic. `k` probe positions derive
  * from the one 64-bit hash by double hashing — `g_i = h1 + i·h2 mod m`
  * with `h1` the low word, `h2` the high word forced odd, the standard
  * Kirsch–Mitzenmacher construction — so the probe side
  * ([[BloomAgg.mayContain]]) can recompute positions from the same single
  * hash on the driver with no Spark machinery.
  *
  * Sizing: `bits` must be a power of two (mask, not modulo). The default
  * 2^16 bits = 8 KiB per file holds ~5k keys at k=6 under 1% false
  * positives; a false positive only costs a wasted file read, never a
  * wrong row — probes are ALWAYS followed by an exact filter.
  *
  * Used per file group (`groupBy(input_file_name)`) on the write path
  * only: ObjectHashAggregate with a byte-array buffer, merge = bitwise OR,
  * so it distributes like any partial aggregate.
  */
final class BloomAgg(bits: Int, k: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bloom bits must be a power of two >= 64, got $bits")
  require(k >= 1 && k <= 16, s"bloom k must be in [1,16], got $k")

  override def zero: Array[Byte] = new Array[Byte](bits / 8)

  override def reduce(b: Array[Byte], hash: Long): Array[Byte] = {
    BloomAgg.set(b, bits, k, hash); b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** The aggregating Column: `bloom(xxhash64(key...))`. */
  def column(hashCol: Column, bits: Int, k: Int = 6): Column =
    udaf(new BloomAgg(bits, k), Encoders.scalaLong).apply(hashCol)

  @inline private def positions(bits: Int, k: Int, hash: Long): Array[Int] = {
    val mask = bits - 1
    val h1 = hash.toInt
    val h2 = ((hash >>> 32).toInt | 1) // odd => full cycle over 2^n
    val out = new Array[Int](k)
    var i = 0
    while (i < k) { out(i) = (h1 + i * h2) & mask; i += 1 }
    out
  }

  private def set(b: Array[Byte], bits: Int, k: Int, hash: Long): Unit = {
    val pos = positions(bits, k, hash)
    var i = 0
    while (i < k) {
      val p = pos(i)
      b(p >>> 3) = (b(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Driver/probe side: could `hash` be in the set this filter summarizes?
    * False positives possible (bounded by sizing), false negatives never. */
  def mayContain(b: Array[Byte], bits: Int, k: Int, hash: Long): Boolean = {
    val pos = positions(bits, k, hash)
    var i = 0
    while (i < k) {
      val p = pos(i)
      if ((b(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}
