package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR feature extractor — md5 hash-bucket per token of the
  * canonicalized text — as ONE fused native kernel:
  * `token_buckets(text, buckets)` ≡
  * `transform(filter(split(trim(regexp_replace(regexp_replace(lower(text),
  * "[^a-z0-9 ]", ""), " +", " ")), " "), w -> w != ""),
  * w -> bucket32(w) % buckets)` (the [[graft.curate.Sampling.bucket32]]
  * md5 bucket), returning `array<int>`.
  *
  * The composed form's cost is entirely the two `regexp_replace` passes —
  * Java regex over every character of the corpus, measured ~6× slower
  * than a columnar engine's tokenizer on the same text and ~25 s/pass at
  * the ×100 bench corpus. The kernel replicates the EXACT semantics
  * without regex: Spark's own `UTF8String.toLowerCase` (so `lower()`
  * semantics are Spark's, unicode included), then one byte pass where
  * `[a-z0-9]` bytes extend the current token, `0x20` closes it, and every
  * other byte is DELETED (the first regex removes it without inserting a
  * boundary — `"a,b"` is the single token `"ab"`; multi-byte UTF-8 chars
  * are ≥ 0x80 per byte, so byte-wise deletion drops exactly the
  * characters the `[^a-z0-9 ]` class drops). Empty tokens never surface
  * (trim + collapse + the != "" filter). Each token's bucket is the
  * first 4 md5 bytes as an unsigned 32-bit value mod `buckets`, exactly
  * `conv(substring(md5(w),1,8),16,10) % buckets`. Null text → null.
  * Spec-pinned equal to the composed form on random text including
  * punctuation runs, unicode, empties and nulls. */
case class TokenBuckets(child: Expression, bucketsExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(child, bucketsExpr)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_buckets expects a string column, got ${child.dataType}")
    else if (!(bucketsExpr.dataType == IntegerType && bucketsExpr.foldable))
      TypeCheckResult.TypeCheckFailure(
        "token_buckets expects a literal int bucket count")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val buckets: Int = {
    val b = bucketsExpr.eval().asInstanceOf[Int]
    require(b >= 1, s"token_buckets: bucket count must be >= 1, got $b")
    b
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else TokenBuckets.compute(t.asInstanceOf[UTF8String], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = ${childGen.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.TokenBuckets.compute(
        |    ${childGen.value}, $buckets);
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenBuckets =
    copy(child = newChildren(0), bucketsExpr = newChildren(1))

  override def prettyName: String = "token_buckets"
}

object TokenBuckets {

  private val mdTl = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Per-row kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String, buckets: Int): ArrayData = {
    var out = new Array[Int](8)
    var n = 0
    foreachBucket(text, buckets) { b =>
      if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
      out(n) = b
      n += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** [[TokenBucketCounts]]' kernel: the same byte pass folded straight
    * into a dense `buckets`-slot count vector — no per-occurrence array
    * ever materializes. */
  def computeCounts(text: UTF8String, buckets: Int): ArrayData = {
    val out = new Array[Int](buckets)
    foreachBucket(text, buckets)(b => out(b) += 1)
    new GenericArrayData(out)
  }

  /** The shared tokenize-and-hash byte pass (see the class scaladoc for
    * the exact composed-form semantics this replicates). */
  @inline private def foreachBucket(text: UTF8String, buckets: Int)(
      f: Int => Unit): Unit = {
    val bytes = text.toLowerCase.getBytes
    val md = mdTl.get()
    val digest = new Array[Byte](16)
    var tok = new Array[Byte](64)
    var tlen = 0
    def closeToken(): Unit = {
      if (tlen > 0) {
        md.reset()
        md.update(tok, 0, tlen)
        md.digest(digest, 0, 16)
        val v = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        f((v % buckets).toInt)
        tlen = 0
      }
    }
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (tlen == tok.length) tok = java.util.Arrays.copyOf(tok, tlen * 2)
        tok(tlen) = c
        tlen += 1
      } else if (c == ' ') closeToken()
      // any other byte: deleted, no token boundary (regex-strip semantics)
      i += 1
    }
    closeToken()
  }
}

/** `token_bucket_counts(text, buckets)`: [[TokenBuckets]] folded into a
  * DENSE per-row count vector — `array<int>` of length `buckets` where
  * slot b holds the number of token occurrences hashing to bucket b.
  * Exactly `aggregate(token_buckets(text, B), zeros(B), inc-at-slot)`,
  * in one pass with no intermediate per-occurrence array. Null text →
  * null. The DSIR scorer is the motivating consumer: a corpus row's
  * whole feature distribution rides as one fixed-width vector, so the
  * bucket-distribution aggregate is an element-wise vector sum and the
  * per-doc score a dot product — no explode, no per-(doc, bucket)
  * shuffle. */
case class TokenBucketCounts(child: Expression, bucketsExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(child, bucketsExpr)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_bucket_counts expects a string column, got ${child.dataType}")
    else if (!(bucketsExpr.dataType == IntegerType && bucketsExpr.foldable))
      TypeCheckResult.TypeCheckFailure(
        "token_bucket_counts expects a literal int bucket count")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val buckets: Int = {
    val b = bucketsExpr.eval().asInstanceOf[Int]
    require(b >= 1, s"token_bucket_counts: bucket count must be >= 1, got $b")
    b
  }

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else TokenBuckets.computeCounts(t.asInstanceOf[UTF8String], buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = ${childGen.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.functions.TokenBuckets.computeCounts(
        |    ${childGen.value}, $buckets);
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TokenBucketCounts =
    copy(child = newChildren(0), bucketsExpr = newChildren(1))

  override def prettyName: String = "token_bucket_counts"
}
