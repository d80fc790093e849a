package graft

import org.apache.spark.sql.functions._
import graft.plans.Analyze
import graft.functions.{MySqlFunctions => M}

/** Optimizer-facing behavior: ANALYZE statistics reach the catalog
  * (rowCount + per-column NDV/histograms for CBO), flagship plans
  * keep filters pushed into the parquet scan, and Oracle-mode
  * function variants implement Oracle NULL semantics. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  test("analyze computes table + column statistics the CBO can read") {
    val df = Tables.t(spark, sfDir, "supplier")
    Analyze.analyzed(spark, df, "supplier_stats", Seq("s_suppkey", "s_nationkey"))
    val t = Analyze.tableStats(spark, "supplier_stats")
    assert(t.get("Statistics").exists(s => s.contains("rows")), t.get("Statistics"))
    val c = Analyze.columnStats(spark, "supplier_stats", "s_nationkey")
    assert(c.get("distinct_count").exists(_.trim.toLong > 0), c)
    assert(c.contains("histogram"))
    // and the optimizer actually picks the stats up in the plan
    val rel = spark.table("supplier_stats").queryExecution.optimizedPlan.stats
    assert(rel.rowCount.exists(_.toLong == df.count()))
    spark.sql("DROP TABLE supplier_stats")
  }

  test("stats-driven join reorder moves the selective dim ahead of the big join") {
    // the reference picks its join order from a stats-weighted
    // spanning tree (dbcon/joblist/jlf_tuplejoblist.cpp:1607-1952);
    // Spark's analog is CostBasedJoinReorder, which only acts when
    // cbo.joinReorder.enabled is on AND every input has ANALYZE stats
    Analyze.analyzed(spark,
      (1 to 50000).map(i => (i.toLong, (i % 1000).toLong)).toDF("k", "j"), "jr_big1")
    Analyze.analyzed(spark,
      (1 to 50000).map(i => (i.toLong, s"p$i")).toDF("k", "payload"), "jr_big2")
    Analyze.analyzed(spark,
      (0 to 4).map(j => (j.toLong, s"seg$j")).toDF("j", "seg"), "jr_tiny")
    try {
      // syntactically the two big tables join FIRST; the tiny join
      // (selectivity 5/1000 on j) is written last
      val sql = """SELECT b1.k, b2.payload, t.seg
                   FROM jr_big1 b1
                   JOIN jr_big2 b2 ON b1.k = b2.k
                   JOIN jr_tiny t ON b1.j = t.j"""
      def leafOrder(): Seq[String] =
        spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
          .map(_.toString)
          .map(s => Seq("jr_big1", "jr_big2", "jr_tiny").find(s.contains).getOrElse("?"))
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      val syntactic = leafOrder()
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = leafOrder()
      assert(syntactic == Seq("jr_big1", "jr_big2", "jr_tiny"))
      assert(reordered != syntactic, s"CBO did not reorder: $reordered")
      // the 250-row selective join must run before the 50k x 50k one
      assert(reordered.indexOf("jr_tiny") < 2, s"tiny joined last in $reordered")
      // reordering is a pure optimization: results identical
      assert(spark.sql(sql).count() == 250)
    } finally {
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      Seq("jr_big1", "jr_big2", "jr_tiny").foreach(t => spark.sql(s"DROP TABLE $t"))
    }
  }

  test("runtime bloom filter from the selective side prunes the big side's scan") {
    // the reference eliminates big-side extents using small-side
    // runtime values (casual partition elimination via extent min/max);
    // Spark's analog is runtime bloom-filter injection — on by default,
    // but gated by size thresholds calibrated for real clusters (the
    // application side must scan > 10 GB), so at 100 TB it fires on
    // exactly the plans that need it. The test lowers the gates to
    // show the mechanism at test scale.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val olds = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.t(spark, sfDir, "lineitem")
      val ord = Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      // and the filtered plan still computes the right answer
      val (bloomed, rows) = (j.collect(), {
        spark.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try j.collect()
        finally spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      })
      assert(bloomed.toSeq == rows.toSeq)
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("filter pushdown reaches the parquet scan in flagship queries") {
    val plan = SparkEntry.queries("q6_forecast")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), "no pushed filters in q6 scan")
    assert(plan.contains("l_shipdate"), "shipdate range not pushed")
    // column pruning: only the 4 referenced columns are read
    assert("ReadSchema: [^\n]*l_extendedprice".r.findFirstIn(plan).isDefined)
    assert(!plan.contains("l_partkey"), "unreferenced column not pruned from scan")
  }

  test("oracle-mode variants: NULL/empty semantics") {
    def one(c: org.apache.spark.sql.Column): Any =
      Seq(1).toDF("x").select(c).collect()(0).get(0)
    assert(one(M.concatOracle(lit("a"), lit(null), lit("b"))) == "ab")
    assert(one(M.trimOracle(lit("   "))) == null)
    assert(one(M.replaceOracle(lit("a.b.c"), lit("."), lit("-"))) == "a-b-c")
    assert(one(M.replaceOracle(lit("abc"), lit(""), lit("-"))) == "abc")
    assert(one(M.decodeOracle(lit(null), lit(null), lit("was-null"), lit("dflt"))) == "was-null")
    assert(one(M.decodeOracle(lit(2), lit(1), lit("one"), lit(2), lit("two"))) == "two")
    assert(one(M.decodeOracle(lit(9), lit(1), lit("one"), lit("dflt"))) == "dflt")
  }

  test("bucketed tables join and aggregate without a shuffle") {
    import graft.plans.Bucketing
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 8)
    // joining on the bucket key requires no exchange on either side
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString.take(800))
    // and results match the shuffled plan
    val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(joined.orderBy("l_orderkey").collect().toSeq ==
      expect.orderBy("l_orderkey").collect().toSeq)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE ord_b")
  }

  test("salted skew join equals the plain join and spreads the hot key") {
    import graft.plans.SkewJoin
    // one hot key (0) with 5000 left rows
    val left = (1 to 5500).map(i => (if (i <= 5000) 0L else i.toLong, i)).toDF("k", "v")
    val right = (0 to 600).map(i => (i.toLong, s"r$i")).toDF("rk", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", salts = 8)
    val plain = left.join(right, col("k") === col("rk"))
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head().getLong(0) == plain.agg(sum("v")).head().getLong(0))
    // determinism across runs (no rand() in the salt)
    assert(salted.orderBy("k", "v").collect().toSeq ==
      SkewJoin.saltedInnerJoin(left, right, "k", "rk", salts = 8)
        .orderBy("k", "v").collect().toSeq)
  }

  test("scalar UDF registration path works in SQL") {
    graft.functions.UdfSdk.register(spark)
    assert(spark.sql("SELECT udf_reverse_words('hello brave new world')")
      .collect()(0).getString(0) == "world new brave hello")
  }
}
