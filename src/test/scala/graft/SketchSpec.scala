package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregates vs exact answers, and the
  * sketch-union reaggregation property (partial sketches merged ==
  * sketch of the whole — what makes incremental 100 TB rollups
  * possible without rescanning history). */
class SketchSpec extends SparkSpec {

  test("hll estimates and approx aggregates stay within tolerance of exact") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.agg(
      countDistinct(col("l_partkey")).cast("double").as("d_part"),
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"))
      .collect()(0)
    val approx = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).cast("double").as("hll_part"),
      approx_count_distinct(col("l_partkey")).cast("double").as("acd_part"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50a"))
      .collect()(0)
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) / exact.getDouble(0) < 0.05)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(0)) / exact.getDouble(0) < 0.05)
    assert(math.abs(approx.getDouble(2) - exact.getDouble(1)) <= 1.0)
  }

  test("union of partial sketches equals the sketch of the union") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val whole = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("e")).collect()(0).getLong(0)
    val merged = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .collect()(0).getLong(0)
    assert(whole == merged)
  }
}
