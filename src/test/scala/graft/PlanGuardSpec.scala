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
  // same bounded shape as q_sketch_approx. q_curriculum crossJoins a
  // 1-row broadcast percentile-thresholds frame (same class).
  // q_topk_ties joins the 1-row broadcast k-th-value threshold (the
  // WITH TIES rewrite) — same bounded class. q_hybrid_rrf joins the
  // 1-ROW broadcast query-vector frame (query-by-example semantic
  // side of the fusion) — the q_ann_brute class with |queries| = 1. q_emb_label_margin
  // crossJoins the broadcast label-centroid frame (#labels rows —
  // bounded by the label alphabet, the q_ann_brute class). The
  // q*_true_* partsupp derivations cross join a 4-ROW VALUES supplier
  // index (the TPC-H 4-suppliers-per-part rule) and compare against
  // an uncorrelated 1-row scalar — both constant-bounded.
  private val allowNestedLoop =
    Set("q_join_cross", "q_ann_brute", "q_hard_negatives", "q_sketch_approx",
      "q_const_projection", "q_topk_ties", "q_emb_label_margin",
      "q2_true_mincost", "q11_true_important", "q16_true_suppcnt",
      "q20_true_potential",
      "q_decontam_semantic", "q_bm25_topk", "q_lm_entropy", "q_ccnet_buckets", "q_benford", "q_walkforward", "q_basket_lift", "q_stickiness", "q_ab_test", "q_anomaly_days", "q_term_dispersion", "q_collocations",
      "q_importance_weights",
      "q_source_kl", "q_lm_bigram", "q_lm_trigram", "q_lm_kneser_ney",
      "q_sample_temperature",
      "q_curriculum", "q_mix_epochs", "q_hybrid_rrf")

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

  // Row-level batteries must stay single-stage scan pipelines: one
  // parquet scan, the whole battery in the scan's own projection, no
  // Exchange of the wide projected rows. Round 8 removed the global
  // ORDER BY that was range-shuffling the full projection of each —
  // this pins the shape so it can't quietly come back.
  test("row-level matrix/json_table queries plan without any Exchange") {
    val exchangeFree = Seq("q_type_matrix_num", "q_type_matrix_datestr",
      "q_type_matrix_null", "q_type_matrix_stredge", "q_type_matrix_dtedge",
      "q_type_matrix_decedge", "q_json_table")
    val offenders = exchangeFree.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (plan.contains("Exchange")) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected Exchange in: $offenders")
  }
}
