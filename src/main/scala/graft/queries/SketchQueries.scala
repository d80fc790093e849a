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
      // per-group HLL sketches, then a union across groups — the
      // reaggregation pattern (daily sketch -> monthly rollup).
      // Property-oracled (the r9 HLL-window template): sketch
      // estimates are engine-specific, but their ERROR BOUNDS are
      // not — the query emits the exact per-group counts (DuckDB
      // recomputes those) plus booleans asserting each approximate
      // answer sits inside its published bound, all computed from
      // exact values derived IN the same query. Every boolean is
      // deterministic (fixed input → fixed sketch → fixed estimate),
      // and the oracle pins them TRUE:
      //  - HLL lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%; 5% is > 3σ
      //  - approx_count_distinct default rsd 5%; gate at 15% (3σ)
      //  - GK accuracy 1000 → rank error ≤ n/1000; p50_approx must
      //    land between the EXACT 0.47 and 0.53 quantiles (Spark's
      //    exact `percentile`, interpolation shift ≪ the 3% rank
      //    slack — NOT a high-accuracy approx sketch, whose buffer is
      //    O(accuracy) memory and dominated this query's runtime)
      val li = t(s, dir, "lineitem")
      val perFlag = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"),
          approx_count_distinct(col("l_suppkey")).as("approx_supp"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_approx"),
          count_distinct(col("l_partkey")).as("exact_parts"),
          count_distinct(col("l_suppkey")).as("exact_supp"),
          percentile(col("l_quantity"), array(lit(0.47), lit(0.53))).as("qex"),
          count(lit(1)).as("n"))
      val overall = perFlag.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_total"))
      val exactTotal = li.agg(count_distinct(col("l_partkey")).as("exact_total"))
      perFlag
        .select(col("l_returnflag"), col("n"),
          col("exact_parts"), col("exact_supp"),
          (abs(hll_sketch_estimate(col("sk")) - col("exact_parts"))
            <= col("exact_parts") * 0.05).as("parts_ok"),
          (abs(col("approx_supp") - col("exact_supp"))
            <= col("exact_supp") * 0.15).as("supp_ok"),
          (col("p50_approx") >= col("qex")(0) &&
            col("p50_approx") <= col("qex")(1)).as("p50_ok"))
        .crossJoin(overall)
        .crossJoin(exactTotal)
        .select(col("l_returnflag"), col("n"), col("exact_parts"),
          col("exact_supp"), col("parts_ok"), col("supp_ok"), col("p50_ok"),
          col("exact_total"),
          (abs(col("est_total") - col("exact_total"))
            <= col("exact_total") * 0.05).as("total_ok"))
        .orderBy(col("l_returnflag"))
    }),
    "q_heavy_hitters" -> ((s, dir) => {
      // SpaceSaving top-k over (returnflag, linestatus) combos, k=16 ≥
      // the 6-value universe → no eviction fires and the sketch is
      // EXACT, so the oracle is the plain GROUP BY — this pins the
      // update/merge/eval plumbing through a real multi-partition
      // aggregation; the eviction regime is spec'd in SketchSpec.
      t(s, dir, "lineitem")
        .select(concat(col("l_returnflag"), col("l_linestatus")).as("flag"))
        .select(call_function("heavy_hitters", col("flag"), lit(16)).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"),
          col("e.err").as("err"))
        .orderBy(col("est").desc, col("item"))
    }),
    "q_sketch_quantiles" -> ((s, dir) => {
      // percentile_approx in its EXACT regime (accuracy ≥ group size →
      // the GK summary retains every value), so the oracle is DuckDB's
      // exact discrete quantile — pinning the sketch's update/merge/
      // query plumbing through a real multi-partition aggregation,
      // exactly like q_heavy_hitters. Lower accuracies are the
      // mergeable 100 TB path; SketchSpec bounds that regime's error.
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000000)).as("q"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("q")(0).as("p50"),
          col("q")(1).as("p90"), col("q")(2).as("p99"), col("n"))
        .orderBy(col("event_type"))
    }),
    "q_top_per_group" -> ((s, dir) => {
      // bounded top-k per group: TopKPerGroup heap aggregate instead
      // of the row_number window — map tasks ship ≤ k rows per group,
      // never the whole group. Composite BIGINT key (price cents ·1e9
      // + orderkey·10 + linenumber) is unique, so the top-3 set and
      // hash are deterministic; oracle = the window formulation.
      t(s, dir, "lineitem")
        .withColumn("_ck", expr(
          "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)" +
            " * 1000000000 + l_orderkey * 10 + l_linenumber"))
        .groupBy(col("l_returnflag"))
        .agg(call_function("top_k_per_group", col("_ck"),
          concat_ws("-", col("l_orderkey"), col("l_linenumber")), lit(3)).as("tk"))
        .select(col("l_returnflag"), posexplode(col("tk")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rank"),
          col("col.key").as("key"), col("col.payload").as("payload"))
        .orderBy(col("l_returnflag"), col("rank"))
    })
  )

  // q_sketch_approx is property-oracled: DuckDB recomputes the exact
  // distinct counts/group sizes and pins every error-bound boolean
  // TRUE; heavy_hitters runs in its exact regime and is value-checked.
  val oracle: Map[String, String] = Map(
    "q_sketch_approx" ->
      """WITH tot AS (SELECT count(DISTINCT l_partkey) AS exact_total FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supp,
        |  TRUE AS parts_ok, TRUE AS supp_ok, TRUE AS p50_ok,
        |  CAST(tot.exact_total AS BIGINT) AS exact_total, TRUE AS total_ok
        |FROM lineitem CROSS JOIN tot
        |GROUP BY l_returnflag, tot.exact_total
        |ORDER BY l_returnflag""".stripMargin,
    "q_sketch_quantiles" ->
      """SELECT event_type,
        |  quantile_disc(value, 0.5) AS p50,
        |  quantile_disc(value, 0.9) AS p90,
        |  quantile_disc(value, 0.99) AS p99,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_top_per_group" ->
      """WITH t AS (SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 1000000000 + l_orderkey * 10 + l_linenumber AS ck,
        |    l_orderkey || '-' || l_linenumber AS payload
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, ck, payload,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY ck DESC) AS rk
        |  FROM t)
        |SELECT l_returnflag, CAST(rk AS INT) AS rank, ck AS key, payload
        |FROM r WHERE rk <= 3 ORDER BY l_returnflag, rank""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT l_returnflag || l_linestatus AS item,
        |  CAST(count(*) AS BIGINT) AS est, CAST(0 AS BIGINT) AS err
        |FROM lineitem GROUP BY 1 ORDER BY est DESC, item""".stripMargin
  )
}
