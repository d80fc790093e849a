package graft.queries

import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate, mergeable summaries a 100 TB
  * engine needs where exact DISTINCT/percentile state would not fit:
  * HyperLogLog sketches (buildable per partition/day and UNIONED
  * later — the property that makes incremental rollups work),
  * approx_count_distinct, and approx_percentile. Rows-only entry
  * (approximate results differ across implementations by design);
  * SketchSpec asserts the error bounds against exact answers. */
object SketchQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_sketch_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // per-group HLL sketches, then a union across groups — the
      // reaggregation pattern (daily sketch -> monthly rollup)
      val perFlag = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
          approx_count_distinct(col("l_suppkey")).as("approx_supp"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_approx"),
          count(lit(1)).as("n"))
      val overall = perFlag.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("distinct_parts_total"))
      perFlag
        .select(col("l_returnflag"),
          hll_sketch_estimate(col("sk")).as("distinct_parts"),
          col("approx_supp"), col("p50_approx"), col("n"))
        .crossJoin(overall)
        .orderBy(col("l_returnflag"))
    })
  )

  // approximate by design → no SQL oracle; bounds asserted in SketchSpec
  val oracle: Map[String, String] = Map.empty
}
