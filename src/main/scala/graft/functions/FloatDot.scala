package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float/double array columns as a native Catalyst
  * expression — the hot kernel of every similarity-search and
  * embedding-dedup path (norms, cosines, k-means assignment all reduce to
  * it; corpus embeddings are `array<float>`, centroid means are
  * `array<double>`).
  *
  * The composed form `aggregate(zip_with(a, b, ...), 0.0, +)` has the same
  * semantics but is a higher-order function: interpreted lambda calls plus
  * an intermediate products array allocated per row pair — a per-row cost
  * that multiplies by k (centroids) or |queries| in the inner loops. This
  * expression runs one fused primitive loop and participates in whole-stage
  * codegen like any built-in.
  *
  * Semantics are IDENTICAL to the composed form, preserving the DuckDB
  * oracles bit for bit: sequential index-order fold of
  * `(double)a[i] * (double)b[i]` (float widening = the `cast("double")` the
  * composed form applied), empty arrays give 0.0, and a null element or
  * mismatched lengths give NULL (zip_with pads the shorter side with null,
  * which nulls the fold).
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "vec_dot expects two array<float>/array<double> columns, got " +
          s"(${left.dataType}, ${right.dataType})")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val leftFloat = isFloat(left.dataType)
  private lazy val rightFloat = isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $r =
         |  graft.functions.FloatDot.compute($a, $b, $leftFloat, $rightFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object FloatDot {
  /** Shared kernel for interpreted eval and generated code. Sequential
    * index-order accumulation — the same fold order as the composed
    * `aggregate(zip_with(...))` form, so results are bit-identical. */
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val va = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val vb = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += va * vb
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
