package graft

import org.apache.spark.sql.types.Decimal
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UnscaledFixed

/** Fuzzes the fused double→unscaled-long kernel against the reference
  * two-step path it replaces (Spark's Cast semantics: BigDecimal shortest
  * string, setScale HALF_UP) — the bit-identity contract the
  * DecimalSumFastPath rule relies on. */
class UnscaledFixedSpec extends AnyFunSuite {

  /** Spark's own double→decimal(p,s) conversion, then unscaled long;
    * None = cast overflow. */
  private def reference(d: Double, p: Int, s: Int): Option[Long] =
    try {
      val dec = Decimal(d)
      if (dec.changePrecision(p, s)) Some(dec.toUnscaledLong) else None
    } catch { // Decimal(NaN/Inf) throws NumberFormatException = cast fails
      case _: NumberFormatException => None
    }

  private def kernel(d: Double, p: Int, s: Int): Option[Long] =
    try Some(UnscaledFixed.compute(d, UnscaledFixed.pow10(s),
      UnscaledFixed.pow10(p), s))
    catch { case _: ArithmeticException => None }

  private def check(d: Double, p: Int, s: Int): Unit =
    assert(kernel(d, p, s) === reference(d, p, s),
      s"mismatch for d=$d decimal($p,$s)")

  test("string-rounding ties where the binary product rounds the other way") {
    // 1.005 → nearest double 1.00499…: string path HALF_UPs to 1.01,
    // naive Math.round(d*100) gives 100. The kernel must agree with the
    // string path.
    for (d <- Seq(1.005, 2.675, 0.015, 8.835, -1.005, -2.675, 1234.565))
      check(d, 12, 2)
    assert(kernel(1.005, 12, 2) === Some(101L)) // NOT 100: "1.005" HALF_UP
  }

  test("typical 2dp money values hit the fast path exactly") {
    var i = -100000
    while (i <= 100000) {
      val d = i / 100.0
      assert(UnscaledFixed.compute(d, 100L, UnscaledFixed.pow10(12), 2) ===
        reference(d, 12, 2).get)
      i += 1
    }
  }

  test("uniform random doubles across magnitudes match the reference") {
    val rnd = new scala.util.Random(0xA11CE)
    for (_ <- 1 to 200000) {
      val mag = math.pow(10, rnd.nextInt(20) - 6) // 1e-6 .. 1e13
      val d = (rnd.nextDouble() - 0.5) * 2 * mag
      for ((p, s) <- Seq((12, 2), (18, 6), (6, 4), (18, 0), (9, 9)))
        check(d, p, s)
    }
  }

  test("random raw bit patterns (denormals, extremes) match the reference") {
    val rnd = new scala.util.Random(0xBEEF)
    for (_ <- 1 to 200000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN) check(d, 12, 2)
    }
  }

  test("non-finite and overflow inputs throw (ANSI cast behavior)") {
    for (d <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        1e300, -1e300, 1.0e10))
      assert(kernel(d, 12, 2).isEmpty === reference(d, 12, 2).isEmpty ||
        kernel(d, 12, 2) === reference(d, 12, 2))
    assert(kernel(Double.NaN, 12, 2).isEmpty)
    assert(kernel(1e300, 12, 2).isEmpty)
    // boundary: 10 digits of int part is the dec(12,2) limit
    assert(kernel(9999999999.99, 12, 2) === Some(999999999999L))
    assert(kernel(10000000000.0, 12, 2).isEmpty)
  }
}
