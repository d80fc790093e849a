package graft

/** Fleet-wide plan guard: every query in SparkEntry must plan without
  * an accidental cartesian product or nested-loop join — the two
  * shapes that stay invisible at sf0.001 and detonate at 100 TB.
  * Intentional cross joins are allowlisted explicitly so a new one
  * can't slip in unreviewed. */
class PlanGuardSpec extends SparkSpec {

  // deliberate cross joins: q_join_cross (the cross-join operator
  // itself, 5×5 dims), q_ann_brute (corpus × broadcast query set —
  // the documented brute-force baseline), q_sketch_approx (crossJoin
  // with a 1-row global sketch), q_const_projection (no-table),
  // q_decontam_semantic (corpus × broadcast BENCHMARK — eval sets are
  // bounded-small by contract, so |corpus|·|bench| pairs is the
  // intended one-scan shape; see Decontamination.semanticScores).
  // q_bm25_topk / q_lm_entropy / q_importance_weights /
  // q_sample_temperature join a 1-ROW broadcast global-statistics
  // frame (N/avgdl, totals/vocab, the temperature (N, Z) pair) — the
  // same bounded shape as q_sketch_approx.
  private val allowNestedLoop =
    Set("q_join_cross", "q_ann_brute", "q_sketch_approx", "q_const_projection",
      "q_decontam_semantic", "q_bm25_topk", "q_lm_entropy", "q_importance_weights",
      "q_source_kl", "q_lm_bigram", "q_sample_temperature")

  test("no unplanned CartesianProduct / BroadcastNestedLoopJoin in any query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.sparkPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val bad = (plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")) && !allowNestedLoop(name)
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"nested-loop/cartesian plans: $offenders")
  }
}
