package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary-search membership in a SORTED string array — the fast-set probe
  * that makes "filter by a broadcast-sized key set inside a projection"
  * viable: `array_contains` is a linear scan (O(|set|) per probed value —
  * 10⁵-element hot sets × 10⁶ probes is 10¹¹ comparisons), while this is
  * O(log |set|) over the same one-copy broadcast array, so the probe side
  * stays a zero-shuffle codegen projection at any corpus size.
  *
  * CONTRACT: `left` must be sorted ascending in UTF8 binary order —
  * exactly what `array_sort` over Spark strings produces (UTF8String
  * compareTo is byte order; for the md5-hex keys this engine probes the
  * order is plain ASCII). An unsorted array silently yields wrong
  * membership, so callers build the array with `array_sort` — and ONLY
  * `array_sort` — in the SAME plan (LineCleanSpec pins agreement with
  * `array_contains` under randomized fixtures). Null array or null key →
  * null (standard BinaryExpression semantics); null ELEMENTS compare
  * greater than any key — consistent with `array_sort` placing nulls
  * LAST, so an array_sort-built array with a null tail still probes
  * correctly. `sort_array(asc)` is NOT a valid builder: it places nulls
  * FIRST, which would silently break the probe on a null-containing
  * array (current callers probe md5 hot sets, which are null-free — the
  * contract matters for new call sites). */
case class SortedArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_array_contains expects (array<string>, string), got ($l, $r)")
    }

  override protected def nullSafeEval(arr: Any, key: Any): Any =
    SortedArrayContains.search(arr.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) =>
      s"graft.functions.SortedArrayContains.search($a, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedArrayContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_array_contains"
}

object SortedArrayContains {
  /** Classic binary search over the ArrayData's UTF8String elements.
    * Shared by interpreted eval and generated code. */
  def search(arr: ArrayData, key: UTF8String): Boolean = {
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val e = arr.getUTF8String(mid)
      val c = if (e == null) 1 else e.compareTo(key)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }
}
