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
  // q_rfm crossJoins the 1-row broadcast quintile-thresholds frame
  // (12 percentile_disc cut points — the q_curriculum class).
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
      "q2_true_mincost_v2", "q11_true_important", "q16_true_suppcnt",
      "q20_true_potential",
      "q_decontam_semantic", "q_bm25_topk", "q_lm_entropy", "q_ccnet_buckets", "q_benford", "q_walkforward", "q_basket_lift", "q_stickiness", "q_ab_test", "q_anomaly_days", "q_term_dispersion", "q_collocations",
      "q_importance_weights", "q_rfm",
      "q_source_kl", "q_lm_bigram", "q_lm_trigram", "q_lm_kneser_ney",
      "q_sample_temperature",
      "q_curriculum", "q_mix_epochs", "q_hybrid_rrf")

  // every gated query, built once and shared by the fleet-wide sweeps
  // below (several builders stage real work — DML, streams, catalog
  // mutations — so building is the expensive part, not asserting).
  // Queries routed through Q.withScratch/localize return a
  // LocalRelation whose plan text says nothing about the real query —
  // the plans localize() executed are drained per query and audited
  // alongside, so the cartesian sweep is NOT vacuous for them.
  private lazy val built
      : Seq[(String, org.apache.spark.sql.DataFrame, Seq[String])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      graft.queries.Q.drainLocalizedPlans() // discard stale captures
      val df = try fn(spark, sfDir)
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      (name, df, graft.queries.Q.drainLocalizedPlans())
    }

  // Global (unpartitioned) windows funnel their whole input through ONE
  // task — invisible at gate scale, fatal at 100 TB (the r12 verdict's
  // q_ccnet_buckets finding). The real ground rule (SCALE.md): a global
  // window may only run over a frame whose size is BOUNDED independent
  // of fact-table cardinality — constant-bounded audit tables, NDV- or
  // calendar-bounded aggregates, LIMIT-k reductions, or the |rows|/span
  // second level of a grouped prefix sum. Every such site is allowlisted
  // WITH its bound; a new unpartitioned window anywhere else fails here
  // before it ever ships.
  private val allowGlobalWindow: Map[String, String] = Map(
    "q_skew_audit" -> "per-join-key count frame (key NDV; plans/SkewJoin.scala)",
    "q_abc_analysis" -> "parts-level Pareto aggregate (part NDV; swap note in-code)",
    "q_bpe_merges" -> "10-row merge audit table (numMerges constant)",
    "q_collation" -> "collation-key probe frame (segment NDV, constant)",
    "q_collation2" -> "collation-key probe frame (segment NDV, constant)",
    "q_window_sliding_distinct" -> "per-day aggregate (calendar-bounded)",
    "q_window_sliding_hll" -> "per-day sketch aggregate (calendar-bounded)",
    "q_heaps_curve" -> "grouped prefix sum: 2nd level over |docs|/100 group totals",
    "q_pack_sequences" -> "grouped prefix sum: 2nd level over |docs|/100 group totals (llm/Packing.scala)",
    "q_zipf_slope" -> "rank over LIMIT-1000 vocabulary head (constant)",
    "q_hybrid_rrf" -> "rank over two LIMIT-50 TakeOrdered frames (constant)",
    "q_ratio_report" -> "event_type x dow cell aggregate (constant-bounded)",
    "q_chi2_independence" -> "event_type x dow cell aggregate (constant-bounded)",
    "q_moving_corr" -> "per-day aggregate (calendar-bounded)",
    "q_survival_km" -> "distinct-duration aggregate (calendar-bounded NDV)")

  test("no global (unpartitioned) window over an unbounded frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = built.flatMap { case (name, df, staged) =>
      val inMain =
        try df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.nonEmpty
        catch { case _: Throwable => false } // streaming plans may refuse optimize
      val inStaged = staged.exists(hasGlobalWindowNode)
      if ((inMain || inStaged) && !allowGlobalWindow.contains(name)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unallowlisted global-window plans (single-partition sort of the " +
        s"whole frame at scale): $offenders")
  }

  /** Physical-plan-string detector for the localized/withScratch plans
    * (captured as text): a `Window` node whose one-line render has only
    * TWO top-level bracket groups (exprs + order) — the partitioned
    * form has three. Nested brackets inside window expressions are
    * depth-tracked. */
  private def hasGlobalWindowNode(plan: String): Boolean =
    plan.linesIterator.exists { ln =>
      val i = ln.indexOf("Window [")
      i >= 0 && ln.substring(0, i).forall(c => "+-:| *()0123456789".contains(c)) && {
        var depth = 0
        var groups = 0
        ln.substring(i + "Window ".length).foreach {
          case '[' => if (depth == 0) groups += 1; depth += 1
          case ']' => depth -= 1
          case _ =>
        }
        groups == 2
      }
    }

  test("no unplanned CartesianProduct / BroadcastNestedLoopJoin in any query") {
    val offenders = built.flatMap { case (name, df, staged) =>
      val plans = df.queryExecution.sparkPlan.toString +: staged
      val bad = plans.exists(p => p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin")) && !allowNestedLoop(name)
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"nested-loop/cartesian plans: $offenders")
  }

  // COMPAT divergence #34 at the schema level: the driver-gate hash
  // has never once passed a query whose output carries a decimal
  // column (9/9 decimal-emitting queries red across r9-r10, 0/328
  // green ones emit any). scripts/check_types.py enforces this over
  // Verify DUMPS (values + temporal ranges); this test enforces the
  // schema half at `sbt test` time, so a new decimal-typed gate
  // output fails CI before it ever reaches the driver. The two 1-row
  // control probes are the documented exceptions.
  test("no gated query schema carries a decimal output column (COMPAT #34)") {
    import org.apache.spark.sql.types._
    val allowTypes = Set("q_probe_decimal", "q_probe_ts9999")
    def hasDecimal(t: DataType): Boolean = t match {
      case _: DecimalType => true
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case _ => false
    }
    val offenders = built.flatMap { case (name, df, _) =>
      if (allowTypes(name)) None
      else {
        val bad = df.schema.fields.filter(f => hasDecimal(f.dataType)).map(_.name)
        if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
      }
    }
    assert(offenders.isEmpty, s"decimal-typed gate outputs: $offenders")
  }

  // Row-level batteries must stay single-stage scan pipelines: one
  // parquet scan, the whole battery in the scan's own projection, no
  // shuffle of the wide projected rows EXCEPT the single trailing
  // range exchange the driver-gate determinism sort requires (r9's
  // Q.sortAll: the driver hash is row-order-sensitive and these
  // tables have no unique natural key, so a total output order is a
  // harness contract — see Q.sortAll's scaladoc). What this still
  // forbids: any hashpartitioning exchange (an accidental aggregate/
  // join in a row-level battery) and more than one exchange of any
  // kind (a shuffle BESIDES the gate sort).
  test("row-level matrix/json_table queries shuffle only for the gate sort") {
    val rowLevel = Seq("q_type_matrix_num_v2", "q_type_matrix_datestr",
      "q_type_matrix_null_v2", "q_type_matrix_stredge", "q_type_matrix_dtedge_v2",
      "q_type_matrix_decedge_v2", "q_type_matrix_castmx", "q_type_matrix_poly",
      "q_type_matrix_fnnum", "q_type_matrix_fnstr", "q_type_matrix_fndt",
      "q_type_matrix_fncond", "q_json_table")
    val offenders = rowLevel.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      if (exchanges > 1 || plan.contains("hashpartitioning"))
        Some(s"$name ($exchanges exchanges)")
      else None
    }
    assert(offenders.isEmpty, s"non-gate-sort shuffle in: $offenders")
  }
}
