package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `UnscaledValue(Cast(double AS decimal(p,s)))` fused into one allocation-
  * free kernel: the unscaled long `round_half_up(d · 10^s)` under DECIMAL
  * string-rounding semantics.
  *
  * Semantics contract (must stay bit-identical to Spark's cast, which the
  * [[graft.plans.DecimalSumFastPath]] rule otherwise emits): Spark casts
  * double→decimal through `BigDecimal.valueOf(d)` — the SHORTEST decimal
  * string representing `d` — then `setScale(s, HALF_UP)`. Plain
  * `Math.round(d·10^s)` is NOT that function: 1.005 has no exact double,
  * its nearest double is 1.00499…, so the string path rounds UP while the
  * binary product rounds DOWN. The kernel therefore only short-circuits
  * when it can PROVE the string path's answer:
  *
  *   - compute `c ≈ d·10^s` and test the three integer candidates around
  *     it for EXACT double equality `c/10^s == d`;
  *   - accept only when `|d·10^s| ≤ 1e12`, where one candidate unit
  *     (10^-s) is ≥ ~4000 double-ulps, so at most ONE candidate can map
  *     back to `d` — that candidate IS `d`'s shortest representation
  *     truncated at scale s, hence exactly `valueOf(d).setScale(s)` (no
  *     rounding occurs: a witness with ≤ s fractional digits bounds the
  *     shortest string);
  *   - otherwise (more fractional digits than s, huge magnitudes,
  *     non-finite) fall back to the BigDecimal path verbatim.
  *
  * Only emitted under ANSI eval mode: overflow (integral digits beyond
  * p−s) and non-finite inputs throw, matching ANSI cast behavior loudly —
  * the non-ANSI null-on-overflow variant stays on Spark's own Cast.
  * UnscaledFixedSpec fuzzes the kernel against the two-step expression on
  * millions of doubles, including the 1.005-class ties.
  */
case class UnscaledFixed(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {

  require(precision >= 1 && precision <= 18 && scale >= 0 && scale <= precision,
    s"unscaled_fixed: bad decimal($precision,$scale)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unscaled_fixed expects double, got $other")
    }

  private lazy val pow: Long = UnscaledFixed.pow10(scale)
  private lazy val bound: Long = UnscaledFixed.pow10(precision)

  override protected def nullSafeEval(input: Any): Any =
    UnscaledFixed.compute(input.asInstanceOf[Double], pow, bound, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnscaledFixed.compute($c, ${pow}L, ${bound}L, $scale)")

  override protected def withNewChildInternal(newChild: Expression): UnscaledFixed =
    copy(child = newChild)

  override def prettyName: String = "unscaled_fixed"
}

object UnscaledFixed {

  /** Registry builder: `unscaled_fixed(col, precision, scale)` with
    * literal int precision/scale. */
  def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      "unscaled_fixed(col, precision, scale) takes 3 arguments")
    def litInt(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"unscaled_fixed: $what must be an int literal, got $other")
    }
    UnscaledFixed(exprs.head, litInt(exprs(1), "precision"),
      litInt(exprs(2), "scale"))
  }

  def pow10(n: Int): Long = {
    var p = 1L
    (0 until n).foreach(_ => p *= 10L)
    p
  }

  /** Magnitude cap (on d·10^s) for the exact-candidate fast path: one
    * candidate unit is ≥ 2^52/1e12 ≈ 4500 ulps, so the rounding interval
    * of `d` contains at most one candidate. */
  private final val FastPathBound = 1e12

  /** The per-row kernel, shared by interpreted eval and generated code. */
  def compute(d: Double, pow: Long, bound: Long, scale: Int): Long = {
    val approx = d * pow
    if (Math.abs(approx) <= FastPathBound) { // excludes NaN/Inf (comparisons false)
      val c0 = Math.rint(approx).toLong
      // the true witness is within one unit of the rounded product
      var c = c0
      var hit = c.toDouble / pow == d
      if (!hit) { c = c0 - 1; hit = c.toDouble / pow == d }
      if (!hit) { c = c0 + 1; hit = c.toDouble / pow == d }
      if (hit) {
        if (Math.abs(c) >= bound) throw overflow(d)
        return c
      }
    }
    slow(d, pow, bound, scale)
  }

  private def slow(d: Double, pow: Long, bound: Long, scale: Int): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw overflow(d)
    val r = java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    val u =
      try r.unscaledValue().longValueExact()
      catch { case _: ArithmeticException => throw overflow(d) }
    if (Math.abs(u) >= bound) throw overflow(d)
    u
  }

  private def overflow(d: Double): ArithmeticException =
    new ArithmeticException(
      s"unscaled_fixed: $d does not fit the target decimal " +
        "(ANSI mode: cast overflow)")
}
