package graft

/** Plan-strategy regression pins for flagship queries: the SHAPE each
  * plan must keep (broadcast placement, partial aggregation, top-k
  * pushdown) — PlanGuardSpec rejects catastrophic plans, this pins
  * the good ones so a silent strategy regression (lost broadcast,
  * lost partial agg) fails a named test instead of a benchmark. */
class PlanShapeSpec extends SparkSpec {

  private def shape(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q5_region: fixed-size dims join as broadcasts") {
    val p = shape("q5_region")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast in:\n$p")
  }

  test("q1_agg: partial (map-side) aggregation survives") {
    val p = shape("q1_agg")
    // two HashAggregate levels around one exchange = the 2-phase shape
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("q_topk: ORDER BY + LIMIT plans as TakeOrderedAndProject, never a global sort") {
    val p = shape("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ssb q2_1: nation/region broadcast; fact-side joins stay shuffle under static planning") {
    val p = shape("q_ssb_q2_1")
    assert(p.contains("BroadcastHashJoin"), p)
    // part/supplier must NOT be statically broadcast — they scale with
    // SF; AQE promotes at runtime when actually small
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("q_dedup_exact: map-side combine before the content-hash exchange") {
    val p = shape("q_dedup_exact")
    assert("HashAggregate".r.findAllIn(p).length >= 2 ||
      "ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q_sample_uniform: the md5 filter sits on the scan — no shuffle at all") {
    val p = shape("q_sample_uniform")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
