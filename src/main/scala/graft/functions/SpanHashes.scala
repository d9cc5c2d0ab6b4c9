package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-document span-hash array for [[graft.dedup.SpanDedup]] as ONE
  * native kernel: word array in, `ceil(n/k)` 16-byte span keys out —
  * span `s` keys the word run `[s·k, min((s+1)·k, n))`.
  *
  * The composed spelling (`transform(sequence(...), i →
  * unhex(md5(concat_ws(" ", slice(ws, …)))))`) evaluates FOUR allocating
  * expressions per span — an index array, a sliced array, a
  * concatenated string, and an md5 whose Spark implementation obtains a
  * fresh MessageDigest per call — and profiling put that floor at ~a
  * third of q100's runtime. This kernel walks the word array once per
  * span run and hashes words directly: two 64-bit lanes from two
  * DIFFERENT hash families — lane 1 xxhash64 (Spark's default seed 42),
  * lane 2 MurmurHash64A (Appleby's public-domain murmur2 64-bit
  * variant) — each chained word-by-word (the running hash seeds the
  * next word's), packed big-endian into 16 bytes. Chaining per WORD (not over
  * a concatenated byte stream) keeps word boundaries significant without
  * building the span string, and word order matters because each word's
  * hash seeds the next.
  *
  * Key properties: deterministic across partitions/engines/JVMs (pure
  * function of the UTF-8 bytes); the two lanes use structurally
  * different mixing (xxhash64 vs murmur2-64), so a collision class of
  * either family — including XXH64's seed-INDEPENDENT collision
  * classes, where inputs that collide under one seed collide under
  * every seed and a two-seed-same-family scheme would collapse both
  * lanes at once — does not collapse the pair; a joint collision needs
  * the same input pair to collide under both families simultaneously.
  * Under the random-oracle idealization of that pairing, 10^10 corpus
  * spans sit at ~10^-19 birthday probability; the honest claim is
  * weaker than a true 128-bit permutation (the lanes are two
  * independently designed 64-bit mixes, not halves of one 128-bit
  * state) but far above the single 64-bit key that would already be
  * colliding at billions of spans. NOT cryptographic: an adversary can construct
  * colliding spans; the operator dedups corpus text, not attacker-
  * controlled commitments. A null element hashes as the empty string
  * (tokenizers here never emit null elements); a null array is null. */
case class SpanHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hashes expects array<string> with k >= 1, got $other, k=$k")
    }

  override protected def nullSafeEval(input: Any): Any =
    SpanHashes.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)

  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  /** Initial seed of the murmur2-64 lane: the 64-bit golden ratio (the
    * usual independent-stream constant); the xxhash64 lane uses Spark's
    * default 42. */
  private val Seed2 = 0x9E3779B97F4A7C15L

  /** MurmurHash64A (Austin Appleby's public-domain 64-bit murmur2) over
    * a word's UTF-8 bytes, seeded by the lane's running hash — the
    * second lane's hash FAMILY, chosen structurally different from
    * xxhash64 so neither family's collision classes collapse both
    * lanes. Byte access goes through UTF8String.getByte (no copy);
    * 8-byte chunks are assembled little-endian as the reference
    * implementation reads them on x86. */
  private def murmur64a(w: UTF8String, seed: Long): Long = {
    val m = 0xC6A4A7935BD1E995L
    val r = 47
    val len = w.numBytes()
    var h = seed ^ (len * m)
    var i = 0
    val tail = len - (len & 7)
    while (i < tail) {
      var kk = 0L
      var b = 0
      while (b < 8) {
        kk |= (w.getByte(i + b) & 0xFFL) << (8 * b)
        b += 1
      }
      kk *= m; kk ^= kk >>> r; kk *= m
      h ^= kk; h *= m
      i += 8
    }
    if (tail < len) {
      var kk = 0L
      var b = len - tail - 1
      while (b >= 0) {
        kk = (kk << 8) | (w.getByte(tail + b) & 0xFFL)
        b -= 1
      }
      h ^= kk; h *= m
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nSpans = (n + k - 1) / k
    val out = new Array[Any](nSpans)
    var s = 0
    while (s < nSpans) {
      var h1 = 42L
      var h2 = Seed2
      var i = s * k
      val end = math.min(i + k, n)
      while (i < end) {
        val w =
          if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
        h1 = XxHash64Function.hash(w, StringType, h1)
        h2 = murmur64a(w, h2)
        i += 1
      }
      val bytes = new Array[Byte](16)
      var b = 0
      while (b < 8) {
        bytes(b) = (h1 >>> (56 - 8 * b)).toByte
        bytes(b + 8) = (h2 >>> (56 - 8 * b)).toByte
        b += 1
      }
      out(s) = bytes
      s += 1
    }
    new GenericArrayData(out)
  }
}
