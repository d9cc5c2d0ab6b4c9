package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode as a native Catalyst expression: map an
  * embedding to its `m` subspace codes in one fused primitive loop —
  * `argmax_c (x_j · c − ‖c‖²/2)` per subspace, ties to the smaller code.
  *
  * The composed form this replaces (round 8,
  * [[graft.sim.ProductQuantize.encode]]'s `-array_max(transform(typedlit(
  * books), ...struct...))`) had the right SHAPE — one narrow projection,
  * no shuffle — but the wrong CONSTANT: each code interpreted a lambda
  * over an array-of-struct literal with per-candidate struct allocation
  * and comparator boxing, measured at ~187 µs/vector for ~1k flops
  * (m_pq_encode_x200, 18.7 s for ~100k×64-dim). Here the codebooks ride
  * along as primitive `double[]` reference objects (the model is ~4 KiB —
  * plan-literal regime, never a join side) and the kernel is the same
  * fused multiply-add loop [[FloatDot]] uses, inside whole-stage codegen.
  *
  * Arguments: `pq_encode(emb, books, nrm2, m, ksub)` where `books` is the
  * FLAT m·ksub·subDim codebook (j-major, then code, then component),
  * `nrm2` the flat m·ksub centroid squared norms, both foldable array
  * literals; `m`/`ksub` int literals. Returns `array<long>` of the m
  * codes; null for a null/too-short embedding or a null component (the
  * quantizer's domain is dense vectors — same contract as vec_dot).
  * Arithmetic is bit-identical to the composed form: sequential
  * index-order accumulation of `(double)x_i * c_i`, then `− ‖c‖²/2`,
  * strict `>` argmax keeping the smallest code on ties. */
case class PqEncode(child: Expression, books: Expression, nrm2: Expression,
    mExpr: Expression, ksubExpr: Expression) extends Expression {

  override def children: Seq[Expression] =
    Seq(child, books, nrm2, mExpr, ksubExpr)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!embOk)
      TypeCheckResult.TypeCheckFailure("pq_encode expects an " +
        s"array<float>/array<double> embedding, got ${child.dataType}")
    else if (!(isDoubleArray(books.dataType) && books.foldable &&
        isDoubleArray(nrm2.dataType) && nrm2.foldable))
      TypeCheckResult.TypeCheckFailure("pq_encode expects foldable " +
        "array<double> codebook and norm arguments")
    else if (!(mExpr.dataType == IntegerType && mExpr.foldable &&
        ksubExpr.dataType == IntegerType && ksubExpr.foldable))
      TypeCheckResult.TypeCheckFailure(
        "pq_encode expects literal int m and ksub")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val mVal = mExpr.eval().asInstanceOf[Int]
  private lazy val ksubVal = ksubExpr.eval().asInstanceOf[Int]
  private lazy val booksArr =
    books.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val nrm2Arr =
    nrm2.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val subDim = {
    require(mVal >= 1 && ksubVal >= 1 &&
      booksArr.length % (mVal * ksubVal) == 0 &&
      nrm2Arr.length == mVal * ksubVal,
      s"pq_encode: inconsistent model (|books|=${booksArr.length}, " +
        s"|nrm2|=${nrm2Arr.length}, m=$mVal, ksub=$ksubVal)")
    booksArr.length / (mVal * ksubVal)
  }

  override def eval(input: InternalRow): Any = {
    val e = child.eval(input)
    if (e == null) null
    else PqEncode.compute(e.asInstanceOf[ArrayData], booksArr, nrm2Arr,
      mVal, ksubVal, subDim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", booksArr, "double[]")
    val nrm2Ref = ctx.addReferenceObj("pqNrm2", nrm2Arr, "double[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.isNull} = true;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${childGen.isNull}) {
        |  ${ev.value} = graft.functions.PqEncode.compute(
        |    ${childGen.value}, $booksRef, $nrm2Ref, $mVal, $ksubVal,
        |    $subDim, $isFloat);
        |  ${ev.isNull} = (${ev.value} == null);
        |}
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqEncode =
    copy(child = newChildren(0), books = newChildren(1),
      nrm2 = newChildren(2), mExpr = newChildren(3), ksubExpr = newChildren(4))

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Per-row kernel shared by interpreted eval and generated code: m
    * argmaxes of `x_j·c − ‖c‖²/2` over primitive arrays, sequential
    * accumulation, strict `>` (ties keep the smaller code). Null for a
    * too-short embedding or any null component. */
  def compute(emb: ArrayData, books: Array[Double], nrm2: Array[Double],
      m: Int, ksub: Int, subDim: Int, isFloat: Boolean): ArrayData = {
    if (emb.numElements() < m * subDim) return null
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val eoff = j * subDim
      var best = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val boff = (j * ksub + c) * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          if (emb.isNullAt(eoff + i)) return null
          val v =
            if (isFloat) emb.getFloat(eoff + i).toDouble
            else emb.getDouble(eoff + i)
          acc += v * books(boff + i)
          i += 1
        }
        val score = acc - nrm2(j * ksub + c) / 2
        if (score > best) { best = score; bestC = c }
        c += 1
      }
      out(j) = bestC.toLong
      j += 1
    }
    new GenericArrayData(out)
  }
}
