package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Up-front query admission control — the one ResourceManager behavior
  * (`dbcon/joblist/resourcemanager.h`: ExeMgr refuses a query when the
  * UM pool can't fund it) that Spark's spill-based memory model lacks.
  * See docs/MEMORY.md for the full knob mapping; everything else maps
  * to unified-memory/AQE config, but REFUSAL has to be engine code.
  *
  * The gate prices a query by what is knowable before execution: the
  * post-partition-pruning bytes of every file source in the optimized
  * plan (the same "how many extents would this touch" question the
  * reference answers from the extent map). Two session knobs:
  *
  *   - `spark.graft.admission.maxScanBytes` — refuse plans whose
  *     file-source footprint exceeds the budget (unset/-1 = admit all).
  *   - `spark.graft.admission.log` — when "true", log the per-query
  *     price instead of only gating (observability at rollout).
  *
  * Scale rationale: on a 1000-executor cluster the failure mode this
  * guards is not OOM (spill handles that) but COST — an unbounded
  * interactive query scanning the full 100 TB corpus because a
  * partition predicate didn't prune. Refusing from optimizer-visible
  * metadata costs microseconds and no cluster time. The check runs as
  * an optimizer rule, so it prices the PRUNED plan (a query that keeps
  * a partition filter admits even when the raw table is over budget).
  */
object ResourceGovernor {

  final class QueryRejectedException(val scanBytes: Long, val budget: Long)
      extends RuntimeException(
        s"query rejected by admission control: estimated scan of " +
          s"$scanBytes bytes exceeds spark.graft.admission.maxScanBytes=$budget " +
          "(narrow the scan with partition/file-pruning predicates, or raise the budget)")

  /** Post-pruning bytes of every file source in the plan: for a
    * partitioned source under a partition-column predicate, the price
    * is the byte sum of the SELECTED partitions' files (the same
    * listing the physical scan will do — FileIndex caches it, so this
    * is not a second FS walk); otherwise the full source size. This
    * mirrors the reference pricing a query by extents-after-casual-
    * partitioning, not raw table size. Subquery plans price into the
    * total too. */
  def scanBytes(plan: LogicalPlan): Long = {
    val subs = plan.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case s: SubqueryExpression => s.plan
      })
    }.flatten
    (plan +: subs).map(scanBytesNoSub).sum
  }

  private object Pricer extends PredicateHelper {
    def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  private def scanBytesNoSub(plan: LogicalPlan): Long = plan match {
    case PhysicalOperation(_, filters,
        lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)) =>
      prunedBytes(fs, filters)
    case other => other.children.map(scanBytesNoSub).sum
  }

  private def prunedBytes(fs: HadoopFsRelation, filters: Seq[Expression]): Long = {
    val partCols = fs.partitionSchema.fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val partFilters = filters
      .flatMap(Pricer.split)
      .filter { f =>
        val refs = f.references.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
        refs.nonEmpty && refs.subsetOf(partCols) && f.deterministic &&
          !SubqueryExpression.hasSubquery(f)
      }
    if (partCols.isEmpty || partFilters.isEmpty) fs.location.sizeInBytes
    else
      try fs.location.listFiles(partFilters, Nil)
        .flatMap(_.files.map(_.getLen)).sum
      catch { case _: Throwable => fs.location.sizeInBytes }
  }

  /** Price a DataFrame without running it (uses the optimized plan,
    * so static partition pruning has already happened). */
  def price(df: DataFrame): Long = scanBytes(df.queryExecution.optimizedPlan)

  /** The injected optimizer rule. Never rewrites — only observes and,
    * over budget, refuses. Runs once per optimization; idempotent. */
  case class AdmissionRule(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val budget = spark.conf.getOption("spark.graft.admission.maxScanBytes")
        .map(_.toLong).getOrElse(-1L)
      val logIt = spark.conf.getOption("spark.graft.admission.log")
        .contains("true")
      if (budget >= 0 || logIt) {
        val bytes = scanBytes(plan)
        if (logIt && bytes > 0)
          logInfo(s"[admission] plan prices at $bytes file-source bytes")
        if (budget >= 0 && bytes > budget)
          throw new QueryRejectedException(bytes, budget)
      }
      plan
    }
  }
}
