package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's canonical tokenizer — `words(normalized(text))`, i.e.
  * `split(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]",
  * ""), " +", " ")), " ")` — as ONE fused native kernel.
  *
  * The composed form's cost is the two `regexp_replace` passes: Java
  * regex over every character of the corpus, measured ~6× slower than a
  * columnar engine's tokenizer and the single dominant cost of every
  * tokenizing query at scale (~25 s/pass on the ×100 bench corpus). The
  * kernel preserves the EXACT semantics with no regex: Spark's own
  * `UTF8String.toLowerCase` (so `lower()` is Spark's, unicode included),
  * then one byte pass in which `[a-z0-9]` bytes extend the current
  * token, `0x20` closes it, and every other byte is DELETED — the first
  * regex removes such characters without inserting a boundary, so
  * `"a,b"` is the single token `"ab"`, and the bytes of a multi-byte
  * UTF-8 character are all ≥ 0x80 and drop byte-wise exactly like the
  * character class drops the character. Trim + collapse mean no empty
  * tokens — except that `split` on a fully-empty normalized string
  * yields `[""]`, which the kernel reproduces so it is substitutable
  * for the composed form everywhere, including the `(len+2)/3`-style
  * arithmetic that counts that sentinel. Spec-pinned byte-equal on
  * punctuation runs, unicode, empties and nulls
  * ([[graft.pipeline.TokenBucketsSpec]]'s sibling suite). */
case class FastTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fast_tokens expects a string column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    FastTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FastTokens =
    copy(child = newChild)

  override def prettyName: String = "fast_tokens"
}

object FastTokens {
  /** Per-row kernel shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    var out = new Array[UTF8String](8)
    var n = 0
    var tok = new Array[Byte](64)
    var tlen = 0
    def closeToken(): Unit = {
      if (tlen > 0) {
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = UTF8String.fromBytes(java.util.Arrays.copyOf(tok, tlen))
        n += 1
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
    if (n == 0) // split("", " ") == [""] — preserve the sentinel exactly
      new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    else
      new GenericArrayData(java.util.Arrays.copyOf(out, n).asInstanceOf[Array[Any]])
  }
}
