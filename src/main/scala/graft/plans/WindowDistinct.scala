package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** DISTINCT aggregates over windows — supported by the reference
  * (`utils/windowfunction/windowfunctiontype.h:69-71` lists
  * COUNT/SUM/AVG DISTINCT window variants), rejected by Spark's
  * analyzer (`DISTINCT_WINDOW_FUNCTION_UNSUPPORTED`). This resolution
  * rule rewrites them into supported shapes BEFORE checkAnalysis runs,
  * so both the SQL surface (`COUNT(DISTINCT x) OVER (PARTITION BY p)`)
  * and the DataFrame surface (`countDistinct(x).over(w)`) just work.
  *
  * Two rewrites, chosen by frame:
  *
  *  - **Whole-partition** (no frame, or UNBOUNDED PRECEDING..UNBOUNDED
  *    FOLLOWING): the value is constant per partition, so the rewrite
  *    is a partition-keyed DISTINCT `Aggregate` joined back on
  *    null-safe key equality (window partitioning groups NULL keys
  *    together; a plain equi-join would drop them). This is the
  *    SCALE-SAFE shape: aggregation state is one counter per group —
  *    never a per-row materialized set — and the join's build side is
  *    group-count-sized, which AQE turns into a broadcast. Works for
  *    any distinct aggregate (COUNT/SUM/AVG/multi-arg COUNT), FILTER
  *    clause included.
  *
  *  - **Framed COUNT(DISTINCT x)**: rewritten to
  *    `size(collect_set(x) OVER frame)` — set semantics give
  *    distinctness, collect_set drops NULLs exactly as COUNT(DISTINCT)
  *    ignores them. State is bounded by the frame's row count; for
  *    running (prefix) frames it grows with the partition prefix, the
  *    same gather-the-partition cost profile as the reference's
  *    coordinator window step (`windowfunctionstep.cpp:642-676`).
  *    Framed SUM/AVG(DISTINCT) stay unsupported (Spark's error
  *    surfaces) — the reference computes them the same
  *    whole-partition-gather way, so the parity case is covered.
  *
  * Attribute discipline: the rewritten plan reproduces the Window
  * node's exact output (same attribute ids, names, order) via a final
  * Project, so parent operators resolve untouched.
  */
object WindowDistinctRewrite extends Rule[LogicalPlan] {

  private def isWholePartition(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case UnspecifiedFrame => spec.orderSpec.isEmpty
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  /** Distinct agg window expression eligible for the join-back path. */
  private def wholePartitionDistinct(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(ae: AggregateExpression, spec), _) =>
      ae.isDistinct && isWholePartition(spec)
    case _ => false
  }

  /** Framed single-arg COUNT(DISTINCT x) → size(collect_set(x) over w). */
  private def rewriteFramedCount(e: NamedExpression): NamedExpression = e match {
    case a @ Alias(WindowExpression(
        ae @ AggregateExpression(Count(Seq(child)), _, true, None, _), spec), name)
        if !isWholePartition(spec) =>
      val set = WindowExpression(
        ae.copy(aggregateFunction = CollectSet(child), isDistinct = false), spec)
      Alias(Cast(Size(set, legacySizeOfNull = false), LongType), name)(
        a.exprId, a.qualifier, Some(a.metadata))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window if w.resolved &&
        w.windowExpressions.exists(wholePartitionDistinct) =>
      val (distinct, rest0) = w.windowExpressions.partition(wholePartitionDistinct)
      val rest = rest0.map(rewriteFramedCount)
      // partition-keyed distinct aggregate over the same child
      val keyAliases = w.partitionSpec.zipWithIndex.map { case (k, i) =>
        Alias(k, s"_wd_key$i")()
      }
      val aggAliases = distinct.map {
        case a @ Alias(WindowExpression(ae: AggregateExpression, _), name) =>
          a -> Alias(ae, s"${name}_wd")()
        case other => throw new IllegalStateException(s"unexpected $other")
      }
      val agg = Aggregate(w.partitionSpec, keyAliases ++ aggAliases.map(_._2), w.child)
      val cond = w.partitionSpec.zip(keyAliases)
        .map { case (k, ka) => EqualNullSafe(k, ka.toAttribute): Expression }
        .reduceOption(And)
      // degenerate empty-partition spec: the aggregate is global (one
      // row), the join is a deliberate single-row cross product
      val joined = Join(w.child, agg, LeftOuter, cond, JoinHint.NONE)
      val base = if (rest.nonEmpty) w.copy(windowExpressions = rest, child = joined)
                 else joined
      val byOriginal = aggAliases.map { case (orig, al) => orig.exprId -> al }.toMap
      val projectList: Seq[NamedExpression] = w.child.output ++
        w.windowExpressions.map { ne =>
          byOriginal.get(ne.exprId) match {
            case Some(al) => Alias(al.toAttribute, ne.name)(
              ne.exprId, ne.qualifier, None)
            case None => ne.toAttribute
          }
        }
      Project(projectList, base)

    case w: Window if w.resolved &&
        w.windowExpressions.exists(e => rewriteFramedCount(e) ne e) =>
      w.copy(windowExpressions = w.windowExpressions.map(rewriteFramedCount))
  }
}
