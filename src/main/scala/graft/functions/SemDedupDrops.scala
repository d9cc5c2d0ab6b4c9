package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** The per-cluster SemDeDup sweep (Abbas et al. 2023) as a native Catalyst
  * expression: input is ONE cluster's collected members
  * `array<struct<id:long, csim:double, nrm:double, emb:array<float>>>`,
  * output is the array of DROPPED member ids.
  *
  * Why an expression over collected members instead of the declarative
  * within-cluster pair join it replaced: the pair join shuffles
  * |cluster|² joined rows each carrying TWO embedding arrays (measured
  * ~6 GB through the exchange for 12M pairs of 64-float vectors at the
  * q147 bench scale), where this shape shuffles each embedding exactly
  * once into its cluster's `collect_list` group and runs the O(m²) sweep
  * locally — shuffle volume linear in the corpus, pair work confined to a
  * tight early-breaking loop. The rank window the join form needed is
  * gone too: members are ordered inside eval.
  *
  * Semantics are bit-faithful to the join form (and the DuckDB oracle):
  *  - rank ascending by (csim, id) with SPARK's double ordering
  *    ([[SQLOrderingUtil.compareDoubles]]: NaN greatest, NaN = NaN), null
  *    csim first — exactly the `Window.orderBy(asc)` it replaces;
  *  - member b drops iff SOME earlier-ranked a (dropped or not — the
  *    paper's boolean-matrix sweep) has cos(a,b) ≥ tau, where cos is the
  *    same sequential float→double dot ([[FloatDot.compute]]) over the
  *    same precomputed norms, and the comparison follows Spark's SQL
  *    `>=` on doubles (NaN ≥ tau is TRUE — SQLOrderingUtil again), null
  *    cos never drops;
  *  - the early break on the first above-threshold hit is pure strength
  *    reduction: the join form evaluated every earlier pair and OR'd.
  *
  * `maxMembers` is the loud-failure knob of the LSH family's maxBucket:
  * a cluster larger than it means the pre-clustering budget (k) is wrong
  * for the corpus — the sweep is O(m²) and the collected group O(m) heap,
  * so refuse clearly instead of grinding or OOMing.
  */
case class SemDedupDrops(child: Expression, tau: Double, maxMembers: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s, _) if memberOk(s) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "semdedup_drops expects array<struct<id:long, csim:double, " +
        s"nrm:double, emb:array<float>>>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SemDedupDrops.compute(input.asInstanceOf[ArrayData], tau, maxMembers)

  override protected def withNewChildInternal(newChild: Expression): SemDedupDrops =
    copy(child = newChild)

  override def prettyName: String = "semdedup_drops"
}

object SemDedupDrops {
  /** Null csim sorts FIRST (Spark's asc null ordering), non-null pairs by
    * Spark's double ordering, ties by id — the Window.orderBy this
    * replaces. */
  private def rankLt(csimA: java.lang.Double, idA: Long,
      csimB: java.lang.Double, idB: Long): Boolean = {
    if (csimA == null || csimB == null) {
      if (csimA == null && csimB == null) idA < idB else csimA == null
    } else {
      val c = SQLOrderingUtil.compareDoubles(csimA, csimB)
      if (c != 0) c < 0 else idA < idB
    }
  }

  def compute(members: ArrayData, tau: Double, maxMembers: Int): ArrayData = {
    val m = members.numElements()
    if (m > maxMembers) throw new IllegalStateException(
      s"semdedup_drops: a cluster has $m members (> maxMembers " +
        s"$maxMembers); the sweep is O(m²) per cluster, so re-cluster " +
        "with a larger k (kmeansCentroids) or raise maxCluster explicitly")
    sweep(members, tau, new Array[java.lang.Double](0), new Array[ArrayData](0))
  }

  /** Shared sweep core: rank the batch members by (csim, id), then drop
    * each member that cosines ≥ tau against ANY seed (the registry of the
    * incremental form — ranked before everything, never re-swept) or any
    * earlier-ranked batch member (dropped or not). Size guards are the
    * callers'. */
  private[functions] def sweep(members: ArrayData, tau: Double,
      seedNrms: Array[java.lang.Double], seedEmbs: Array[ArrayData])
      : ArrayData = {
    val m = members.numElements()
    val ids = new Array[Long](m)
    val csims = new Array[java.lang.Double](m)
    val nrms = new Array[java.lang.Double](m)
    val embs = new Array[ArrayData](m)
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 4)
      ids(i) = row.getLong(0)
      csims(i) = if (row.isNullAt(1)) null else row.getDouble(1)
      nrms(i) = if (row.isNullAt(2)) null else row.getDouble(2)
      embs(i) = if (row.isNullAt(3)) null else row.getArray(3)
      i += 1
    }
    val order = Array.range(0, m).sortWith { (a, b) =>
      rankLt(csims(a), ids(a), csims(b), ids(b))
    }
    val dropped = new ArrayBuffer[Long]()
    val ns = seedEmbs.length
    i = if (ns > 0) 0 else 1 // with seeds even the first-ranked can drop
    while (i < m) {
      val b = order(i)
      if (embs(b) != null && nrms(b) != null) {
        var hit = false
        var k = 0
        while (k < ns && !hit) {
          if (seedEmbs(k) != null && seedNrms(k) != null)
            hit = cosHit(seedEmbs(k), seedNrms(k), embs(b), nrms(b), tau)
          k += 1
        }
        var j = 0
        while (j < i && !hit) {
          val a = order(j)
          if (embs(a) != null && nrms(a) != null)
            hit = cosHit(embs(a), nrms(a), embs(b), nrms(b), tau)
          j += 1
        }
        if (hit) dropped += ids(b)
      }
      i += 1
    }
    new GenericArrayData(dropped.toArray)
  }

  private def cosHit(ea: ArrayData, na: java.lang.Double, eb: ArrayData,
      nb: java.lang.Double, tau: Double): Boolean = {
    val d = FloatDot.compute(ea, eb, true, true)
    if (d == null) false
    else {
      val cos = d.doubleValue() / (na * nb)
      // Spark SQL `>=` on doubles: NaN compares greatest
      cos.isNaN || cos >= tau
    }
  }
}
