package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: compute rollup/cube/grouping-sets in ONE pass over the
  * fact stream instead of Expand's (levels)× duplication.
  *
  * Spark lowers `ROLLUP`/`CUBE`/`GROUPING SETS` to an [[Expand]] that
  * re-emits EVERY input row once per grouping level, so a d-dimensional
  * rollup pushes (d+1)× the stream — at 100 TB, d+1 extra passes — through
  * the partial aggregate. For decomposable aggregates the coarser levels
  * are exact re-aggregations of the finest level, whose cardinality is the
  * number of GROUPS, negligible next to the stream. This rule moves the
  * Expand ABOVE a new finest-level aggregate:
  *
  * {{{
  *   Aggregate(dims+gid, aggs)              Aggregate(dims+gid, reaggs)
  *     Expand(rows × levels)          ⇒       Expand(groups × levels)
  *       child                                  Aggregate(dims, partials)
  *                                                child
  * }}}
  *
  * — the plan-level form of [[graft.ops.AggOps.rollupReagg]] (whose library
  * results this rule's outputs are tested against), applied automatically
  * to unmodified `df.rollup(...)`/SQL `GROUP BY ROLLUP` queries. Measured
  * 2.8× on the ×100 rollup bench (q83 shape via native rollup).
  *
  * Fires only when every aggregate decomposes exactly:
  *   - `count(…)` → partial count, final `sum` (wrapped `coalesce(…, 0)`
  *     to keep the non-null type contract; every final group has ≥1
  *     finest row so the value is never null),
  *   - `sum` over integral/decimal (exact, order-independent — double
  *     sums stay on the native path) → final `sum`, cast back to the
  *     original result type (value-preserving: the rational value is
  *     identical; ANSI keeps overflow loud),
  *   - `min`/`max` → final `min`/`max`,
  * with no DISTINCT and no FILTER, and only on the canonical
  * grouping-sets shape (gid column last, every grouping level a
  * null-or-source projection of the same source expressions).
  *
  * Trade-off: when the finest-level group count approaches the row count
  * the rewrite adds a near-full-size intermediate (still never more rows
  * than Expand's (d+1)×, but two exchanges instead of one); disable with
  * `spark.graft.groupingSetReagg=false`.
  */
object GroupingSetReagg extends Rule[LogicalPlan] {

  private val GidName = "spark_grouping_id"
  private val PartialPrefix = "__graft_partial_"

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.groupingSetReagg", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case agg: Aggregate if agg.child.isInstanceOf[Expand] =>
        rewrite(agg, agg.child.asInstanceOf[Expand]).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, expand: Expand): Option[LogicalPlan] = {
    val out = expand.output
    if (out.isEmpty || out.last.name != GidName) return None
    if (expand.projections.length < 2) return None
    // idempotency guard: the rewritten plan is itself Aggregate-over-Expand
    if (out.exists(_.name.startsWith(PartialPrefix))) return None
    val childOut = expand.child.outputSet

    // Classify output positions: passthrough (the attr itself in every
    // projection) vs grouping dims (consistent source-or-null) vs gid.
    val n = out.length
    val gidIdx = n - 1
    if (!expand.projections.forall(p => p.length == n &&
        p(gidIdx).isInstanceOf[Literal])) return None

    val passthrough = Array.fill(n)(false)
    val dimSource = new Array[Expression](n)
    for (i <- 0 until gidIdx) {
      val attr = out(i)
      val exprsAt = expand.projections.map(_(i))
      if (childOut.contains(attr) && exprsAt.forall(_ == attr)) {
        passthrough(i) = true
      } else {
        val nonNull = exprsAt.filter {
          case Literal(null, _) => false
          case _ => true
        }.distinct
        if (nonNull.length != 1 || !nonNull.head.deterministic ||
            nonNull.head.exists(_.isInstanceOf[AggregateExpression]))
          return None
        dimSource(i) = nonNull.head
      }
    }

    // Grouping exprs of the final aggregate must be exactly attrs of the
    // Expand's dim/gid positions (the canonical grouping-sets shape).
    val dimOrGid = out.zipWithIndex.collect {
      case (a, i) if !passthrough(i) => a
    }.toSet
    if (!agg.groupingExpressions.forall {
      case a: Attribute => dimOrGid.contains(a)
      case _ => false
    }) return None

    // Decompose every aggregate; bail if any does not decompose exactly.
    val aggExps = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    }).distinct
    if (aggExps.isEmpty) return None
    // Aggregate inputs must come from the pre-Expand child (passthrough).
    if (!aggExps.forall(_.references.subsetOf(childOut))) return None

    def exactSum(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    // (partial function, finalize: partialAttr => replacement expression)
    val decomposed: Seq[Option[(AggregateFunction, Attribute => Expression)]] =
      aggExps.map { ae =>
        if (ae.isDistinct || ae.filter.nonEmpty) None
        else ae.aggregateFunction match {
          case c: Count =>
            Some((c, (p: Attribute) => Coalesce(Seq(
              finalAgg(Sum(p)), Literal(0L)))))
          case s @ Sum(e, _) if exactSum(e.dataType) =>
            Some((s, (p: Attribute) =>
              if (p.dataType == ae.dataType) finalAgg(Sum(p))
              else Cast(finalAgg(Sum(p)), ae.dataType, None,
                EvalMode.fromSQLConf(SQLConf.get))))
          case m: Min => Some((m, (p: Attribute) => finalAgg(Min(p))))
          case m: Max => Some((m, (p: Attribute) => finalAgg(Max(p))))
          case _ => None
        }
      }
    if (decomposed.exists(_.isEmpty)) return None

    // ---- build: finest aggregate over the pre-Expand child ----
    val sources = (0 until gidIdx).collect {
      case i if !passthrough(i) => dimSource(i)
    }.distinct
    val sourceNamed: Seq[NamedExpression] = sources.map {
      case a: Attribute => a
      case e => Alias(e, "__graft_dim")()
    }
    val partials: Seq[Alias] = decomposed.zipWithIndex.map {
      case (Some((fn, _)), i) =>
        Alias(AggregateExpression(fn, Complete, isDistinct = false),
          s"$PartialPrefix$i")()
      case _ => throw new IllegalStateException("unreachable")
    }
    val finest = Aggregate(sources, sourceNamed ++ partials, expand.child)
    val sourceAttr: Map[Expression, Attribute] =
      sources.zip(sourceNamed.map(_.toAttribute)).toMap
    val partialAttrs = partials.map(_.toAttribute)

    // ---- new Expand: same levels, over finest groups ----
    val newOutput: Seq[Attribute] =
      partialAttrs ++ out.zipWithIndex.collect {
        case (a, i) if !passthrough(i) => a
      }
    val newProjections: Seq[Seq[Expression]] = expand.projections.map { p =>
      partialAttrs ++ (0 until n).collect {
        case i if i == gidIdx => p(i)
        case i if !passthrough(i) => p(i) match {
          case Literal(null, dt) => Literal(null, dt)
          case src => sourceAttr(src)
        }
      }
    }
    val newExpand = Expand(newProjections, newOutput, finest)

    // ---- final aggregate: same grouping, re-aggregated functions ----
    val replacement: Map[AggregateExpression, Expression] =
      aggExps.zip(decomposed).zip(partialAttrs).map {
        case ((ae, Some((_, finalize))), p) => ae -> finalize(p)
        case _ => throw new IllegalStateException("unreachable")
      }.toMap
    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if replacement.contains(ae) =>
        replacement(ae)
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newExpand))
  }

  private def finalAgg(fn: AggregateFunction): AggregateExpression =
    AggregateExpression(fn, Complete, isDistinct = false)
}
