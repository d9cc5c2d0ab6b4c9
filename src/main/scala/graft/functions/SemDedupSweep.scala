package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** The INCREMENTAL SemDeDup sweep: one cluster's BATCH members (left —
  * the same `struct<id, csim, nrm, emb>` shape [[SemDedupDrops]] takes)
  * swept against the cluster's accumulated REGISTRY members (right —
  * `array<struct<nrm:double, emb:array<float>>>`; ids and csims are not
  * needed: registry members all rank before the batch, their decisions
  * are immutable, and their internal order cannot change which batch
  * members drop). Output is the dropped BATCH ids.
  *
  * A batch member b drops iff cos(seed, b) ≥ tau for SOME registry seed,
  * OR cos(a, b) ≥ tau for some earlier-ranked batch member a (dropped or
  * not — the paper's boolean-matrix sweep). Seeds are never re-swept
  * against each other, so a call costs O(|registry|·|batch| + |batch|²)
  * per cluster, not O((|registry|+|batch|)²) — the property that makes
  * the incremental form cheaper than a rebuild once the registry
  * dominates. Cosine arithmetic, double ordering, and NaN/null semantics
  * are [[SemDedupDrops]]'s exactly; a NULL registry array (cluster unseen
  * so far) is an empty one.
  *
  * `maxMembers` guards |registry| + |batch| per cluster, the same loud
  * contract as the batch kernel. */
case class SemDedupSweep(left: Expression, right: Expression,
    tau: Double, maxMembers: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  private def memberOk(t: DataType): Boolean = t match {
    case StructType(fs) if fs.length == 4 =>
      fs(0).dataType == LongType && fs(1).dataType == DoubleType &&
        fs(2).dataType == DoubleType &&
        (fs(3).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
    case _ => false
  }

  private def seedOk(t: DataType): Boolean = t match {
    case StructType(fs) if fs.length == 2 =>
      fs(0).dataType == DoubleType &&
        (fs(1).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(m, _), ArrayType(s, _)) if memberOk(m) && seedOk(s) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "semdedup_sweep expects (array<struct<id:long, csim:double, " +
          "nrm:double, emb:array<float>>>, array<struct<nrm:double, " +
          s"emb:array<float>>>), got ($l, $r)")
    }

  // null registry = empty registry, so BinaryExpression's null-safe eval
  // (which would return null) is overridden: only a null BATCH is null.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val m = left.eval(input)
    if (m == null) return null
    val s = right.eval(input)
    SemDedupSweep.compute(m.asInstanceOf[ArrayData],
      if (s == null) null else s.asInstanceOf[ArrayData], tau, maxMembers)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SemDedupSweep =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "semdedup_sweep"
}

object SemDedupSweep {
  def compute(members: ArrayData, seeds: ArrayData, tau: Double,
      maxMembers: Int): ArrayData = {
    val m = members.numElements()
    val ns = if (seeds == null) 0 else seeds.numElements()
    if (m + ns > maxMembers) throw new IllegalStateException(
      s"semdedup_sweep: a cluster has ${m + ns} members ($ns registry + " +
        s"$m batch; > maxMembers $maxMembers); the sweep is O(m²) per " +
        "cluster, so re-cluster with a larger k (kmeansCentroids) or " +
        "raise maxCluster explicitly")
    val sNrm = new Array[java.lang.Double](ns)
    val sEmb = new Array[ArrayData](ns)
    var i = 0
    while (i < ns) {
      val row = seeds.getStruct(i, 2)
      sNrm(i) = if (row.isNullAt(0)) null else row.getDouble(0)
      sEmb(i) = if (row.isNullAt(1)) null else row.getArray(1)
      i += 1
    }
    SemDedupDrops.sweep(members, tau, sNrm, sEmb)
  }
}
