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

  test("space-saving: exact regime, guarantee under eviction, merge floor") {
    import spark.implicits._
    // exact regime: k >= distinct -> exact counts, zero error
    val exact = Seq("a", "b", "a", "c", "a", "b")
      .toDF("x").coalesce(1)
      .selectExpr("inline(heavy_hitters(x, 8))")
      .as[(String, Long, Long)].collect().toSeq
    assert(exact == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
    // eviction regime (single partition -> deterministic): a true
    // heavy hitter (freq > N/k) must be captured with est >= true
    // count and est - err <= true count
    val data = (1 to 400).map(_ => "hot") ++ (1 to 200).map(i => s"t$i")
    val sk = data.toDF("x").coalesce(1)
      .selectExpr("inline(heavy_hitters(x, 10))")
      .as[(String, Long, Long)].collect().toSeq
    assert(sk.size == 10)
    val hot = sk.find(_._1 == "hot").get
    assert(hot._2 >= 400L && hot._2 - hot._3 <= 400L)
    // mergeability: multi-partition run still captures the heavy
    // hitter and over-approximates (est >= true count)
    val skP = data.toDF("x").repartition(8)
      .selectExpr("inline(heavy_hitters(x, 10))")
      .as[(String, Long, Long)].collect().toSeq
    val hotP = skP.find(_._1 == "hot").get
    assert(hotP._2 >= 400L && hotP._2 - hotP._3 <= 400L)
  }

  test("top_k_per_group: equals window formulation under any partitioning") {
    import spark.implicits._
    val data = (1 to 500).map(i => (s"g${i % 4}", i.toLong, s"p$i"))
    for (parts <- Seq(1, 8)) {
      val got = data.toDF("g", "k", "p").repartition(parts)
        .groupBy($"g").agg(org.apache.spark.sql.functions.call_function(
          "top_k_per_group", $"k", $"p", org.apache.spark.sql.functions.lit(5)).as("tk"))
        .selectExpr("g", "inline(tk)")
        .as[(String, Long, String)].collect().toSet
      val want = data.groupBy(_._1).flatMap { case (g, vs) =>
        vs.sortBy(-_._2).take(5).map(v => (g, v._2, v._3))
      }.toSet
      assert(got == want, s"parts=$parts")
    }
  }
}
