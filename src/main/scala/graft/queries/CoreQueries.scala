package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator suite: scans, filters, joins (all types),
  * aggregations, rollup/cube, having, top-K, set ops, subqueries.
  *
  * Mirrors the reference's operator inventory (SURVEY.md §2.1-2.7,
  * §2.9): TupleBPS scan → parquet scan w/ pushed filters;
  * TupleHashJoinStep → Catalyst join selection (broadcast for small
  * dims = the reference's PM-join, `batchprimitiveprocessor-jl.h`);
  * TupleAggregateStep → partial+final HashAggregate;
  * TupleAnnexStep → distinct/orderBy/limit/offset;
  * TupleUnion → union/intersect/except; jlf_subquery.cpp transforms
  * → Catalyst subquery rewrites.
  */
object CoreQueries {
  import Q._

  /** Queries expressible as the same ANSI SQL in Spark and DuckDB. */
  private val sameSql: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_not_in" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_exists" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_not_exists" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_scalar_select" ->
      """SELECT c_custkey, (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_derived_table" ->
      """SELECT seg, CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS seg_total, COUNT(*) AS n
        |FROM (SELECT c_mktsegment AS seg, o_totalprice AS total
        |      FROM customer JOIN orders ON c_custkey = o_custkey) t
        |GROUP BY seg ORDER BY seg""".stripMargin,
    "q_filter_nullsafe" ->
      """SELECT a.c_custkey AS ca, b.c_custkey AS cb
        |FROM customer a JOIN customer b
        |  ON NULLIF(a.c_nationkey, 3) IS NOT DISTINCT FROM NULLIF(b.c_nationkey, 3)
        | AND a.c_custkey < b.c_custkey
        |WHERE a.c_custkey < 30 AND b.c_custkey < 30
        |ORDER BY ca, cb""".stripMargin
  )

  private def revenue = d(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))))
  private val oRevenue =
    s"CAST(SUM(${oDec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${oDec("l_discount")})) AS DOUBLE)"

  val queries: Map[String, QFn] = sameSql.map { case (n, s) =>
    n -> ((sp: SparkSession, dir: String) => Q.sql(sp, dir, s))
  } ++ Map[String, QFn](
    // ---- scans / filters (SURVEY §2.1-2.2) ----
    "q_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_quantity") < 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q_filter_pred" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus") =!= "P" &&
          col("o_totalprice").between(100000, 200000) &&
          col("o_orderpriority").like("%H%"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),
    "q_filter_colcol" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_discount") > col("l_tax"))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- aggregation (SURVEY §2.4) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          revenue.as("sum_disc_price"),
          avgDec(col("l_quantity")).as("avg_qty"),
          avgDec(col("l_extendedprice")).as("avg_price"),
          avgDec(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q6_forecast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP '1998-01-01 00:00:00'") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(d(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"))
    }),
    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          d(sum_distinct(dec(col("l_quantity")))).as("sum_dist_qty"))
        .orderBy(col("l_returnflag"))
    }),
    "q_agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_samp"),
          round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
          round(var_samp(col("l_quantity")), 6).as("v_samp"),
          round(var_pop(col("l_quantity")), 6).as("v_pop"))
        .orderBy(col("l_returnflag"))
    }),
    "q_agg_bitops" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          bit_and(col("l_linenumber")).as("b_and"),
          bit_or(col("l_linenumber")).as("b_or"),
          bit_xor(col("l_linenumber")).as("b_xor"))
        .orderBy(col("l_returnflag"))
    }),
    "q_agg_corr" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 6).as("cov_p"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("cov_s"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).cast("long").as("n"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 6).as("ax"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 6).as("ay"))
        .orderBy(col("l_returnflag"))
    }),
    "q_agg_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sumDec(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q_agg_cube" -> ((s, dir) => {
      t(s, dir, "lineitem").cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sumDec(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q_agg_median" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med"),
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
          expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"))
        .orderBy(col("l_returnflag"))
    }),
    "q_agg_mode" -> ((s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity")).count()
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("count").desc, col("l_quantity").asc)
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
        .orderBy(col("l_returnflag"))
    }),
    "q_having" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("dq"))
        .filter(col("dq") > 2000)
        .select(col("l_suppkey"), d(col("dq")).as("sum_qty"))
        .orderBy(col("l_suppkey"))
    }),

    // ---- joins (SURVEY §2.3) ----
    "q3_shipping" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < expr("TIMESTAMP '1998-03-15 00:00:00'"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > expr("TIMESTAMP '1998-03-15 00:00:00'"))
      // customer scales linearly with SF — no broadcast hint; AQE picks
      // the strategy at runtime (broadcast at small SF, shuffled hash at
      // 100 TB). Hard-coding broadcast here was round-1's scale killer.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_region" -> ((s, dir) => {
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nat = t(s, dir, "nation")
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      // supplier scales with SF too — only the fixed-size dims
      // (nation: 25 rows, region: 5 rows) get an explicit broadcast.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("n_name"))
    }),
    "q10_returns" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(revenue.as("rev"))
        .orderBy(col("rev").desc, col("c_custkey"))
        .limit(20)
    }),
    "q_join_left" -> ((s, dir) => {
      t(s, dir, "nation").join(t(s, dir, "customer"),
          col("n_nationkey") === col("c_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"), sumDec(col("c_acctbal")).as("acct_total"))
        .orderBy(col("n_name"))
    }),
    "q_join_right" -> ((s, dir) => {
      t(s, dir, "supplier").join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"), "right")
        .select(col("n_name"), col("s_name"))
        .orderBy(col("n_name").asc_nulls_first, col("s_name").asc_nulls_first)
    }),
    "q_join_full" -> ((s, dir) => {
      t(s, dir, "nation").filter(col("n_regionkey") === 0)
        .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"), "full")
        .select(col("n_name"), col("s_name"))
        .orderBy(col("n_name").asc_nulls_first, col("s_name").asc_nulls_first)
    }),
    "q_join_semi" -> ((s, dir) => {
      t(s, dir, "orders").join(
          t(s, dir, "lineitem").filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    }),
    "q_join_anti" -> ((s, dir) => {
      t(s, dir, "orders").join(
          t(s, dir, "lineitem").filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey")).orderBy(col("o_orderkey"))
    }),
    "q_join_theta" -> ((s, dir) => {
      // Interval self-join. Keying only on user_id is quadratic for a
      // hot user; adding a coarse time bucket (1h = the window width)
      // to the equi-key bounds per-task pair work. A match's b.ts lies
      // in (a.ts, a.ts+1h], i.e. in a's bucket or the next one — the
      // a-side is exploded to both buckets so each pair is seen exactly
      // once, then the precise interval predicate filters post-join.
      val e = t(s, dir, "events").select(col("user_id"), col("ts"))
        .withColumn("bkt", (unix_timestamp(col("ts")) / 3600).cast("long"))
      val a = e.withColumn("jb", explode(array(col("bkt"), col("bkt") + 1)))
        .select(col("user_id").as("a_uid"), col("ts").as("a_ts"), col("jb"))
      val b = e.select(col("user_id").as("b_uid"), col("ts").as("b_ts"), col("bkt"))
      a.join(b, col("a_uid") === col("b_uid") && col("jb") === col("bkt") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("a_uid").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region")
      r.select(col("r_name").as("r1")).crossJoin(r.select(col("r_name").as("r2")))
        .orderBy(col("r1"), col("r2"))
    }),

    // ---- sort / limit / distinct / set ops (SURVEY §2.6-2.7) ----
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15).offset(5)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),
    // FETCH FIRST n ROWS WITH TIES (MariaDB 10.6 front end). Spark
    // has no WITH TIES and the naive rank()-over-global-order rewrite
    // funnels the whole table through ONE partition — instead: find
    // the k-th sort value with a distributed TakeOrderedAndProject,
    // broadcast that 1-row threshold, and filter at the scan. The
    // oracle is DuckDB's independent QUALIFY rank() formulation.
    "q_topk_ties" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderdate").as("d"))
      val bound = base.orderBy(col("d").desc).limit(50)
        .agg(min(col("d")).as("_bound"))
      base.join(broadcast(bound), col("d") >= col("_bound"))
        .select(col("k"), col("d"))
        .orderBy(col("d").desc, col("k"))
    }),
    "q_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q_union" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct().orderBy(col("k"))
    }),
    "q_union_all" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 50).select(col("c_nationkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),
    "q_intersect" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),
    "q_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").filter(col("s_suppkey") < 5)
          .select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),
    // ALL variants (bag semantics — multiplicities subtract/min rather
    // than dedup; SQL:1999, superset of the reference like
    // INTERSECT/EXCEPT themselves)
    "q_intersect_all" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_nationkey").as("k"))
        .intersectAll(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),
    "q_except_all" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_nationkey").as("k"))
        .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),
    // NULL-equality + multiplicity matrix across all six set ops: set
    // operations treat NULLs as EQUAL (unlike comparison semantics),
    // and the ALL variants subtract/min multiplicities rather than
    // dedup — minted null keys and controlled duplicates pin both
    // rules per (k, v) cell on both engines. Output is the per-cell
    // COUNT per op, so the result stays group-sized however large the
    // inputs get.
    "q_setop_nulls" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def side(pred: org.apache.spark.sql.Column) = li.filter(pred).select(
        when(col("l_linenumber") =!= 1, col("l_returnflag")).as("k"),
        (col("l_orderkey") % 5).as("v"))
      val a = side(col("l_orderkey") % 3 === 0)
      val b = side(col("l_orderkey") % 3 =!= 2)
      val ops: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "union" -> a.union(b).distinct(),
        "union_all" -> a.union(b),
        "intersect" -> a.intersect(b),
        "intersect_all" -> a.intersectAll(b),
        "except" -> a.except(b),
        "except_all" -> a.exceptAll(b))
      ops.map { case (name, df) =>
          df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("n"))
            .select(lit(name).as("op"), col("k"), col("v"), col("n"))
        }.reduce(_ union _)
        .orderBy(col("op"), col("k"), col("v"))
    }),
    // ROLLUP over a NULLABLE group key: the data's own NULL group and
    // the rollup-synthesized total row both print k = NULL — they are
    // distinguishable ONLY via GROUPING(), the classic disambiguation
    // rule, pinned here per output row on both engines.
    "q_agg_nullgroup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(
          when(col("l_linenumber") =!= 1, col("l_returnflag")).as("k"),
          col("l_quantity"))
        .rollup(col("k"))
        .agg(count(lit(1)).as("n"), sumDec(col("l_quantity")).as("qty"),
          grouping(col("k")).cast("int").as("g"))
        .orderBy(col("g"), col("k"))
    }),
    // join × NULL-key × duplicate-key matrix: every join type over
    // sides with duplicated keys (controlled fan-out) and rare minted
    // NULL keys. Pins in one query: NULL keys never equi-match but DO
    // null-safe-match (the <=> product), anti keeps the NULL probe
    // rows, semi dedups the fan-out, and outer joins null-extend
    // exactly the unmatched multiplicities. Aggregated to one row per
    // join type, so output stays constant-sized at any scale.
    "q_join_nulldup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def side(m: Int, nullLn: Int) = li.filter(col("l_orderkey") % 7 === m)
        .select(when(col("l_orderkey") % 997 =!= nullLn, col("l_orderkey") % 1000)
          .as(if (m == 0) "ka" else "kb"))
      val a = side(0, 0)
      val b = side(3, 3)
      def one(name: String, df: org.apache.spark.sql.DataFrame,
          unmatched: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n"), count(when(unmatched, 1)).as("n_unmatched"))
          .select(lit(name).as("op"), col("n"), col("n_unmatched"))
      val never = lit(false)
      Seq(
        one("inner", a.join(b, col("ka") === col("kb")), never),
        one("nullsafe", a.join(b, col("ka") <=> col("kb")),
          col("ka").isNull && col("kb").isNull),
        one("left", a.join(b, col("ka") === col("kb"), "left"), col("kb").isNull),
        one("right", a.join(b, col("ka") === col("kb"), "right"), col("ka").isNull),
        one("full", a.join(b, col("ka") === col("kb"), "full"),
          col("ka").isNull || col("kb").isNull),
        one("semi", a.join(b, col("ka") === col("kb"), "left_semi"), col("ka").isNull),
        one("anti", a.join(b, col("ka") === col("kb"), "left_anti"), col("ka").isNull))
        .reduce(_ union _)
        .orderBy(col("op"))
    })
  )

  val oracle: Map[String, String] = sameSql ++ Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_quantity < 3 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_pred" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_orderstatus <> 'P'
        |  AND o_totalprice BETWEEN 100000 AND 200000 AND o_orderpriority LIKE '%H%'
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_colcol" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_discount > l_tax ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oSumDec("l_quantity")} AS sum_qty,
         |  ${oSumDec("l_extendedprice")} AS sum_base_price,
         |  $oRevenue AS sum_disc_price,
         |  ${oAvgDec("l_quantity")} AS avg_qty,
         |  ${oAvgDec("l_extendedprice")} AS avg_price,
         |  ${oAvgDec("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast" ->
      s"""SELECT CAST(SUM(${oDec("l_extendedprice")} * ${oDec("l_discount")}) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_agg_distinct" ->
      s"""SELECT l_returnflag,
         |  COUNT(DISTINCT l_suppkey) AS n_supp,
         |  COUNT(DISTINCT l_partkey) AS n_part,
         |  CAST(SUM(DISTINCT ${oDec("l_quantity")}) AS DOUBLE) AS sum_dist_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_samp,
        |  ROUND(STDDEV_POP(l_quantity), 6) AS sd_pop,
        |  ROUND(VAR_SAMP(l_quantity), 6) AS v_samp,
        |  ROUND(VAR_POP(l_quantity), 6) AS v_pop
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_bitops" ->
      """SELECT l_returnflag,
        |  BIT_AND(l_linenumber) AS b_and, BIT_OR(l_linenumber) AS b_or,
        |  BIT_XOR(l_linenumber) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS r,
        |  ROUND(COVAR_POP(l_quantity, l_extendedprice), 6) AS cov_p,
        |  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 6) AS cov_s,
        |  ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
        |  ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS icept,
        |  ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6) AS ax,
        |  ROUND(REGR_AVGY(l_extendedprice, l_quantity), 6) AS ay
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, ${oSumDec("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, ${oSumDec("l_extendedprice")} AS sum_price,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_agg_median" ->
      """SELECT l_returnflag, MEDIAN(l_quantity) AS med,
        |  QUANTILE_CONT(l_quantity, 0.25) AS p25,
        |  QUANTILE_CONT(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty FROM (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY COUNT(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity) t
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_having" ->
      s"""SELECT l_suppkey, CAST(SUM(${oDec("l_quantity")}) AS DOUBLE) AS sum_qty
         |FROM lineitem GROUP BY l_suppkey
         |HAVING SUM(${oDec("l_quantity")}) > 2000
         |ORDER BY l_suppkey""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate, $oRevenue AS rev
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region" ->
      s"""SELECT n_name, $oRevenue AS rev
         |FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin,
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, $oRevenue AS rev
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name
         |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,
    "q_join_left" ->
      s"""SELECT n_name, COUNT(c_custkey) AS n_cust, ${oSumDec("c_acctbal")} AS acct_total
         |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_right" ->
      """SELECT n_name, s_name FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name ASC NULLS FIRST, s_name ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT n_name, s_name
        |FROM (SELECT * FROM nation WHERE n_regionkey = 0) n
        |FULL JOIN supplier ON n_nationkey = s_nationkey
        |ORDER BY n_name ASC NULLS FIRST, s_name ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_anti" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_theta" ->
      """SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    "q_join_cross" ->
      """SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
        |ORDER BY r1, r2""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""".stripMargin,
    "q_topk_ties" ->
      """SELECT o_orderkey AS k, o_orderdate AS d FROM orders
        |QUALIFY rank() OVER (ORDER BY o_orderdate DESC) <= 50
        |ORDER BY d DESC, k""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_union" ->
      """SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier
        |ORDER BY k""".stripMargin,
    "q_union_all" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_custkey < 50
        |UNION ALL SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY k""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_suppkey < 5
        |ORDER BY k""".stripMargin,
    "q_intersect_all" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_custkey < 300
        |INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_except_all" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_custkey < 300
        |EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin,
    "q_setop_nulls" ->
      """WITH a AS (SELECT CASE WHEN l_linenumber <> 1 THEN l_returnflag END AS k,
        |    l_orderkey % 5 AS v FROM lineitem WHERE l_orderkey % 3 = 0),
        |b AS (SELECT CASE WHEN l_linenumber <> 1 THEN l_returnflag END AS k,
        |    l_orderkey % 5 AS v FROM lineitem WHERE l_orderkey % 3 <> 2),
        |all_ops AS (
        |  SELECT 'union' AS op, k, v FROM (SELECT k, v FROM a UNION SELECT k, v FROM b)
        |  UNION ALL
        |  SELECT 'union_all', k, v FROM (SELECT k, v FROM a UNION ALL SELECT k, v FROM b)
        |  UNION ALL
        |  SELECT 'intersect', k, v FROM (SELECT k, v FROM a INTERSECT SELECT k, v FROM b)
        |  UNION ALL
        |  SELECT 'intersect_all', k, v
        |    FROM (SELECT k, v FROM a INTERSECT ALL SELECT k, v FROM b)
        |  UNION ALL
        |  SELECT 'except', k, v FROM (SELECT k, v FROM a EXCEPT SELECT k, v FROM b)
        |  UNION ALL
        |  SELECT 'except_all', k, v
        |    FROM (SELECT k, v FROM a EXCEPT ALL SELECT k, v FROM b))
        |SELECT op, k, v, COUNT(*) AS n FROM all_ops
        |GROUP BY 1, 2, 3
        |ORDER BY op, k NULLS FIRST, v""".stripMargin,
    "q_agg_nullgroup" ->
      s"""SELECT k, COUNT(*) AS n, ${Q.oSumDec("l_quantity")} AS qty,
        |  CAST(GROUPING(k) AS INT) AS g
        |FROM (SELECT CASE WHEN l_linenumber <> 1 THEN l_returnflag END AS k,
        |        l_quantity FROM lineitem)
        |GROUP BY ROLLUP(k)
        |ORDER BY g, k NULLS FIRST""".stripMargin,
    "q_join_nulldup" ->
      """WITH a AS (SELECT CASE WHEN l_orderkey % 997 <> 0
        |      THEN l_orderkey % 1000 END AS ka
        |    FROM lineitem WHERE l_orderkey % 7 = 0),
        |b AS (SELECT CASE WHEN l_orderkey % 997 <> 3
        |      THEN l_orderkey % 1000 END AS kb
        |    FROM lineitem WHERE l_orderkey % 7 = 3),
        |r AS (
        |  SELECT 'inner' AS op, FALSE AS um FROM a JOIN b ON ka = kb
        |  UNION ALL SELECT 'nullsafe', (ka IS NULL AND kb IS NULL)
        |    FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
        |  UNION ALL SELECT 'left', kb IS NULL FROM a LEFT JOIN b ON ka = kb
        |  UNION ALL SELECT 'right', ka IS NULL FROM a RIGHT JOIN b ON ka = kb
        |  UNION ALL SELECT 'full', (ka IS NULL OR kb IS NULL)
        |    FROM a FULL JOIN b ON ka = kb
        |  UNION ALL SELECT 'semi', ka IS NULL FROM a
        |    WHERE EXISTS (SELECT 1 FROM b WHERE b.kb = a.ka)
        |  UNION ALL SELECT 'anti', ka IS NULL FROM a
        |    WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.kb = a.ka))
        |SELECT op, COUNT(*) AS n,
        |  CAST(COUNT(CASE WHEN um THEN 1 END) AS BIGINT) AS n_unmatched
        |FROM r GROUP BY 1 ORDER BY op""".stripMargin
  )
}
