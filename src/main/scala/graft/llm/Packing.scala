package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining batches: documents are laid
  * end-to-end in a deterministic global order and chunked into
  * fixed-token-budget packs (the concat-and-chunk data layout of
  * GPT-style training pipelines). Each doc gets the pack that its
  * first token lands in, its offset inside that pack, and the number
  * of consecutive packs it spans — everything downstream needs to
  * materialize the packed batches.
  *
  * The core primitive is a DISTRIBUTED PREFIX SUM: a naive
  * `sum() over (order by id)` window has an empty PARTITION BY, which
  * Spark plans as a single-partition sort — the whole corpus through
  * one task, a non-starter at 100 TB. Instead the classic two-phase
  * scan: (1) per-group cumulative sums inside `groupSpan`-wide ranges
  * of the (numeric) order key — a parallel window keyed by the group;
  * (2) group TOTALS (one row per group) prefix-summed on a single
  * partition — |groups| rows, not |docs| — and broadcast-joined back.
  * All arithmetic is integer (exact, order-independent), so output is
  * bit-stable across partitionings and engines.
  */
object Packing {

  /** (doc_id, n_tokens, pack_id, pack_off, n_packs) for every doc
    * with ≥ 1 token, packing in ascending-`id` order into
    * `budget`-token packs.
    *
    * @param tokenCount per-doc token count expression; defaults to
    *        the whitespace tokenizer shared with `TextAnalysis`
    * @param groupSpan width of the order-key ranges used as prefix-sum
    *        groups; pick so ~thousands of groups exist at target scale
    *        (the per-group totals table is the only single-partition
    *        data: one row per group) */
  def packSequences(docs: DataFrame, budget: Long, id: String = "doc_id",
      text: String = "text", tokenCount: Column = null,
      groupSpan: Long = 100L): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val n = Option(tokenCount)
      .getOrElse(size(TextAnalysis.tokens(col(text))).cast(LongType))
    val base = docs
      .select(col(id), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("_g", floor(col(id) / lit(groupSpan)).cast(LongType))
    // phase 1: cumulative sum within each order-key range (parallel)
    val wLocal = Window.partitionBy(col("_g")).orderBy(col(id))
    val local = base.withColumn("_cumLocal", sum(col("n_tokens")).over(wLocal))
    // phase 2: per-group totals, prefix-summed over |groups| rows only
    val wGroups = Window.orderBy(col("_g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("_g"))
      .agg(sum(col("n_tokens")).as("_gtot"))
      .withColumn("_goff", coalesce(sum(col("_gtot")).over(wGroups), lit(0L)))
      .select(col("_g"), col("_goff"))
    local.join(broadcast(offsets), "_g")
      .withColumn("_start", col("_goff") + col("_cumLocal") - col("n_tokens"))
      .select(col(id), col("n_tokens"),
        expr(s"_start DIV $budget").as("pack_id"),
        (col("_start") % budget).as("pack_off"),
        (expr(s"(_start + n_tokens - 1) DIV $budget")
          - expr(s"_start DIV $budget") + lit(1L)).as("n_packs"))
  }

  /** Reference single-window formulation (one global sort partition) —
    * the spec checks the distributed two-phase scan against it. */
  private[graft] def packSequencesGlobalWindow(docs: DataFrame, budget: Long,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val n = size(TextAnalysis.tokens(col(text))).cast(LongType)
    docs.select(col(id), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("_cum", sum(col("n_tokens")).over(Window.orderBy(col(id))))
      .withColumn("_start", col("_cum") - col("n_tokens"))
      .select(col(id), col("n_tokens"),
        expr(s"_start DIV $budget").as("pack_id"),
        (col("_start") % budget).as("pack_off"),
        (expr(s"(_start + n_tokens - 1) DIV $budget")
          - expr(s"_start DIV $budget") + lit(1L)).as("n_packs"))
  }
}
