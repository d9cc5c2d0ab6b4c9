package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** MERGE as-of join — the two-sorted-streams form of
  * [[graft.operators.AsofJoin.asof]]: dims and facts arrive as separate
  * children, each clustered by the key and sorted by (key, ts), and one
  * co-partitioned merge pass attaches each fact's latest at-or-before
  * dim payload. No union, no tagged-row shuffle, no sort of the
  * combined stream: when BOTH inputs already carry the layout — bucket-
  * written on the key with an in-bucket (key, ts) sort, the ingest-paid
  * shape every lake table here supports — the plan is scan → merge with
  * ZERO exchanges and ZERO sorts, the as-of analog of q94's co-located
  * bucketed join. On unsorted inputs EnsureRequirements plans one
  * exchange + sort PER SIDE (same total shuffled rows as the union
  * form, minus the tagged-row widening).
  *
  * Semantics are exactly [[AsofCarry]]'s: at a tied timestamp the dim
  * is visible ("at or before" includes equality — the merge advances
  * dims through `<=`); facts with no at-or-before dim emit null
  * payloads; null timestamps sort first (a null-ts dim is before
  * everything in its key); the determinism contract (at most one dim
  * per (key, ts)) is inherited. */
case class AsofMerge(keyCols: Seq[String], tsCol: String,
    payloadCols: Seq[String], factCols: Seq[String],
    dims: LogicalPlan, facts: LogicalPlan) extends BinaryNode {
  override def left: LogicalPlan = dims
  override def right: LogicalPlan = facts
  private def attrIn(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"AsofMerge: no column $n"))
  override def output: Seq[Attribute] =
    factCols.map(attrIn(facts, _)) ++
      payloadCols.map(n => attrIn(dims, n).withNullability(true))
  /** Names, not expressions — declare references so ColumnPruning
    * cannot strip either child (the [[AsofCarry]] lesson). */
  override def references: AttributeSet = {
    if (!childrenResolved) AttributeSet.empty
    else {
      val dNeed = (keyCols :+ tsCol).toSet ++ payloadCols
      val fNeed = (keyCols :+ tsCol).toSet ++ factCols
      AttributeSet(dims.output.filter(a => dNeed.contains(a.name)) ++
        facts.output.filter(a => fNeed.contains(a.name)))
    }
  }
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsofMerge =
    copy(dims = newLeft, facts = newRight)
}

case class AsofMergeExec(keyCols: Seq[String], tsCol: String,
    payloadCols: Seq[String], factCols: Seq[String],
    dims: SparkPlan, facts: SparkPlan) extends BinaryExecNode {
  override def left: SparkPlan = dims
  override def right: SparkPlan = facts

  private def attrIn(p: SparkPlan, n: String): Attribute =
    p.output.find(_.name == n).get

  override def output: Seq[Attribute] =
    factCols.map(attrIn(facts, _)) ++
      payloadCols.map(n => attrIn(dims, n).withNullability(true))

  /** Both children clustered on the key — co-partitioned like a
    * sort-merge join's sides; bucketed tables satisfy it scan-side. */
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(keyCols.map(attrIn(dims, _))),
    ClusteredDistribution(keyCols.map(attrIn(facts, _))))

  /** (key…, ts) ascending per side; nulls-first ts keeps null-ts dims
    * ahead of every real row in their key. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (keyCols.map(attrIn(dims, _)) :+ attrIn(dims, tsCol))
      .map(SortOrder(_, Ascending)),
    (keyCols.map(attrIn(facts, _)) :+ attrIn(facts, tsCol))
      .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = Nil

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning = {
    val outSet = AttributeSet(output)
    facts.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
          if h.references.subsetOf(outSet) => h
      case _ => super.outputPartitioning
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val dOut = dims.output
    val fOut = facts.output
    def ordIn(out: Seq[Attribute], n: String): Int =
      out.indexWhere(_.name == n)
    val dK = keyCols.map(ordIn(dOut, _)).toArray
    val fK = keyCols.map(ordIn(fOut, _)).toArray
    val dTs = ordIn(dOut, tsCol)
    val fTs = ordIn(fOut, tsCol)
    val kTypes = dK.map(dOut(_).dataType)
    val tsType = dOut(dTs).dataType
    val pOrd = payloadCols.map(ordIn(dOut, _)).toArray
    val pTypes = pOrd.map(dOut(_).dataType)
    val fOrd = factCols.map(ordIn(fOut, _)).toArray
    val nP = pOrd.length
    val nF = fOut.length

    // per-column comparators, nulls FIRST (matching Ascending SortOrder)
    def comparator(t: DataType): (Any, Any) => Int = t match {
      case LongType | IntegerType =>
        (a, b) => java.lang.Long.compare(
          a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      case other =>
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(other)
        (a, b) => ord.compare(a, b)
    }
    val kCmp = kTypes.map(comparator)
    val tsCmp = comparator(tsType)

    facts.execute().zipPartitions(dims.execute()) { (fIt, dIt0) =>
      val dIt = dIt0.buffered
      val proj = UnsafeProjection.create(
        fOrd.map(i => BoundReference(i, fOut(i).dataType,
          fOut(i).nullable)) ++
        pOrd.indices.map(j => BoundReference(nF + j, pTypes(j),
          nullable = true)))
      val carry = new Array[Any](nP)
      val carryKey = new Array[Any](dK.length)
      var haveCarry = false
      val carryRow = new GenericInternalRow(carry)
      val nullRow = new GenericInternalRow(nP)
      val joined = new JoinedRow

      def cmpVal(cmp: (Any, Any) => Int, a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else cmp(a, b)

      // dim (key, ts) vs fact (key, ts); <= 0 means the dim is visible
      def dimNotAfter(d: InternalRow, f: InternalRow): Int = {
        var i = 0
        while (i < dK.length) {
          val c = cmpVal(kCmp(i),
            if (d.isNullAt(dK(i))) null else d.get(dK(i), kTypes(i)),
            if (f.isNullAt(fK(i))) null else f.get(fK(i), kTypes(i)))
          if (c != 0) return c
          i += 1
        }
        cmpVal(tsCmp,
          if (d.isNullAt(dTs)) null else d.get(dTs, tsType),
          if (f.isNullAt(fTs)) null else f.get(fTs, tsType))
      }

      def keyMatches(f: InternalRow): Boolean = {
        if (!haveCarry) return false
        var i = 0
        while (i < fK.length) {
          val v = if (f.isNullAt(fK(i))) null else f.get(fK(i), kTypes(i))
          if (cmpVal(kCmp(i), carryKey(i), v) != 0) return false
          i += 1
        }
        true
      }

      fIt.map { f =>
        while (dIt.hasNext && dimNotAfter(dIt.head, f) <= 0) {
          val d = dIt.next()
          var i = 0
          while (i < dK.length) {
            carryKey(i) = if (d.isNullAt(dK(i))) null
              else InternalRow.copyValue(d.get(dK(i), kTypes(i)))
            i += 1
          }
          var j = 0
          while (j < nP) {
            carry(j) = if (d.isNullAt(pOrd(j))) null
              else InternalRow.copyValue(d.get(pOrd(j), pTypes(j)))
            j += 1
          }
          haveCarry = true
        }
        proj(joined(f, if (keyMatches(f)) carryRow else nullRow))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsofMergeExec =
    copy(dims = newLeft, facts = newRight)
}
