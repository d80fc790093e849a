package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function suite (SURVEY.md §2.5 — the reference's
  * WindowFunctionStep, `dbcon/joblist/windowfunctionstep.cpp`, with
  * the function families of `utils/windowfunction/windowfunctiontype.h`).
  *
  * The reference gathers rows at the coordinator and sorts per
  * (partition, order) key; Spark's WindowExec shuffles by partition
  * key and sorts within partitions — the distributed version of the
  * same plan, no custom operator needed.
  *
  * DISTINCT-over-window (`windowfunctiontype.h:69-71`) has no Spark
  * builtin; re-expressed as `size(collect_set(x)) over w` — the
  * rewrite called out in SURVEY.md §7.2.
  */
object WindowQueries {
  import Q._

  private val wPrio = Window.partitionBy(col("o_orderpriority"))

  val queries: Map[String, QFn] = Map(
    // SQL-standard frame EXCLUDE clause (CURRENT ROW / GROUP) — Spark
    // has no EXCLUDE; each variant is re-expressed with plain frames
    // and arithmetic (running frame ending at -1; subtract self;
    // subtract the peer-group sum), and DuckDB's NATIVE EXCLUDE is
    // the oracle — a hash match proves the rewrites ARE the standard
    // semantics, empty-frame NULLs included.
    "q_window_exclude" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DateType, DecimalType}
      val f = col("l_returnflag")
      val sdate = col("l_shipdate").cast(DateType)
      val de = col("l_extendedprice").cast(DecimalType(18, 2))
      val uniq = Window.partitionBy(f)
        .orderBy(sdate, col("l_orderkey"), col("l_linenumber"), de)
      val whole = Window.partitionBy(f)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val peers = Window.partitionBy(f, sdate)
      val wholeSum = sum(de).over(whole)
      val wholeCnt = count(lit(1)).over(whole)
      t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .select(
          col("l_orderkey").as("k1"), col("l_linenumber").cast("int").as("k2"),
          // EXCLUDE CURRENT ROW on a running frame == the frame that
          // simply ends one row earlier (empty at the partition head
          // -> NULL, matching the standard)
          sum(de).over(uniq.rowsBetween(Window.unboundedPreceding, -1))
            .cast("double").as("w_run_excl"),
          // EXCLUDE CURRENT ROW on a bounded frame == count - 1
          (count(lit(1)).over(uniq.rowsBetween(-2, 2)) - 1).as("w_cnt_excl"),
          // whole-partition AVG EXCLUDE CURRENT ROW == (S - v)/(n - 1)
          when(wholeCnt > 1, round(
            (wholeSum - de).cast("double") / (wholeCnt - 1), 6)).as("w_avg_excl"),
          // EXCLUDE GROUP (peers = equal sort value) == S - peer sum
          (wholeSum - sum(de).over(peers)).cast("double").as("w_grp_excl"),
          // EXCLUDE TIES (peers minus self stay out; self stays in)
          // == S - peer sum + v
          (wholeSum - sum(de).over(peers) + de).cast("double")
            .as("w_ties_excl"))
        .orderBy(col("k1"), col("k2"))
    }),
    // SQL:2011 GROUPS frame mode — Spark has ROWS and RANGE only.
    // GROUPS n PRECEDING..m FOLLOWING = rows whose PEER GROUP (tie
    // class of the sort key) is within n/m groups — re-expressed as a
    // RANGE frame over dense_rank (group index): two window passes,
    // ONE shuffle (same partitioning+sort). DuckDB's NATIVE GROUPS
    // is the oracle.
    "q_window_groups" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DateType, DecimalType}
      val f = col("l_returnflag")
      val sdate = col("l_shipdate").cast(DateType)
      val de = col("l_extendedprice").cast(DecimalType(18, 2))
      val byDate = Window.partitionBy(f).orderBy(sdate)
      val byGrp = Window.partitionBy(f).orderBy(col("g"))
      t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey").as("k1"),
          col("l_linenumber").cast("int").as("k2"), f.as("rf"), sdate.as("sd"),
          de.as("de"))
        .withColumn("g", dense_rank().over(
          Window.partitionBy(col("rf")).orderBy(col("sd"))))
        .withColumn("grp_sum", d(sum(col("de")).over(
          Window.partitionBy(col("rf")).orderBy(col("g"))
            .rangeBetween(-1, 1))))
        .withColumn("grp_cnt", count(lit(1)).over(
          Window.partitionBy(col("rf")).orderBy(col("g"))
            .rangeBetween(-2, 0)))
        .select(col("k1"), col("k2"), col("grp_sum"), col("grp_cnt"))
        .orderBy(col("k1"), col("k2"))
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = wPrio.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 40)
        .select(col("o_orderpriority"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"),
          round(percent_rank().over(w), 6).as("prk"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),
    "q_window_frames" -> ((s, dir) => {
      val ord = wPrio.orderBy(col("o_totalprice"), col("o_orderkey"))
      val running = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val moving = ord.rowsBetween(-2, Window.currentRow)
      val range = wPrio.orderBy(col("o_totalprice"))
        .rangeBetween(-5000, Window.currentRow)
      t(s, dir, "orders").filter(col("o_custkey") < 40)
        .select(col("o_orderpriority"), col("o_orderkey"),
          d(sum(dec(col("o_totalprice"))).over(running)).as("run_sum"),
          (d(sum(dec(col("o_totalprice"))).over(moving)) /
            count(lit(1)).over(moving)).as("mov_avg"),
          count(lit(1)).over(range).as("n_in_range"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),
    "q_window_range_interval" -> ((s, dir) => {
      // Time-INTERVAL frame bounds (SQL:2011; the reference's window
      // step evaluates RANGE frames over temporal order keys —
      // windowfunctionstep.cpp framing). Spark's rangeBetween is
      // numeric-only, so the ordering column projects to
      // days-since-epoch and the INTERVAL becomes a day count — same
      // peer semantics, still one partition-keyed shuffle + sort.
      val od = to_date(col("o_orderdate"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(unix_date(od))
      val trail30 = w.rangeBetween(-30, 0)
      val next7 = w.rangeBetween(0, 7)
      t(s, dir, "orders").filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), od.as("o_date"),
          count(lit(1)).over(trail30).as("n_trail30"),
          d(sum(dec(col("o_totalprice"))).over(trail30)).as("sum_trail30"),
          count(lit(1)).over(next7).as("n_next7"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q_window_leadlag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 2, 0.0).over(w).as("next2_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q_window_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("fv"),
          last(col("o_totalprice")).over(w).as("lv"),
          nth_value(col("o_totalprice"), 2).over(w).as("nv2"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q_window_ntile" -> ((s, dir) => {
      val w = wPrio.orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 40)
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),
    "q_window_agg" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
      t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          d(sum(dec(col("l_quantity"))).over(w)).as("part_qty"),
          min(col("l_quantity")).over(w).as("min_qty"),
          max(col("l_quantity")).over(w).as("max_qty"),
          count(lit(1)).over(w).as("n_part"),
          round(stddev_samp(col("l_quantity")).over(w), 6).as("sd_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q_window_distinct" -> ((s, dir) => {
      // COUNT(DISTINCT x) OVER (PARTITION BY p) — reference supports,
      // Spark lacks. collect_set over an unbounded window materializes
      // the whole distinct set on every row (OOM-shaped at scale); the
      // scale-safe rewrite is a bounded-state countDistinct aggregation
      // joined back on the partition key.
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
      val perFlag = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .join(broadcast(perFlag), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("n_supp"))
        // l_returnflag tie-break: (orderkey, linenumber) is NOT unique
        // in this testdata and duplicate pairs carry different flags
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    }),
    "q_window_distinct_rule_v2" -> ((s, dir) => {
      // The same semantics through the ENGINE's Catalyst rewrite
      // (plans/WindowDistinct.scala): the SQL surface accepts
      // COUNT/SUM(DISTINCT) OVER directly — whole-partition distincts
      // become the bounded-state aggregate+join-back plan, the framed
      // running COUNT(DISTINCT) becomes size(collect_set) over the
      // frame. q_window_distinct keeps the hand-rewritten shape for
      // comparison; this entry proves the rule end to end.
      Q.sql(s, dir,
        """SELECT l_orderkey, l_linenumber, l_returnflag,
          |  COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_returnflag) AS n_supp,
          |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2)))
          |    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS sum_qty,
          |  COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_returnflag
          |    ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey
          |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS run_supp
          |FROM lineitem WHERE l_orderkey < 200
          |ORDER BY l_orderkey, l_linenumber, l_returnflag, n_supp, sum_qty,
          |  run_supp""".stripMargin)
    }),
    "q_window_running_rev" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem").filter(col("l_suppkey") < 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          d(sum(dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount"))))
            .over(w)).as("run_rev"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),
    "q_window_sliding_distinct" -> ((s, dir) => {
      // Trailing-7-day DISTINCT customer count per order day — the
      // framed distinct neither engine's window step supports
      // natively at this grain. Exact rewrite: per-day distinct SETS
      // (one groupBy — dedup happens map-side), then a days-grain
      // sliding union. The window runs over the DAYS table (bounded
      // by the calendar, ~2.4k rows regardless of order volume), so
      // the single-partition sort is metadata-sized; the unbounded
      // cardinality work all happened in the distributed groupBy.
      // Scale path for high-cardinality sets: the HLL-sketch sibling
      // below.
      val daily = t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("day"), col("o_custkey"))
        .groupBy(col("day"))
        .agg(collect_set(col("o_custkey")).as("cs"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy(unix_date(col("day"))).rangeBetween(-6, 0)
      daily.select(col("day"),
          sum(col("n_orders")).over(w).as("n_orders_7d"),
          size(array_distinct(flatten(collect_list(col("cs")).over(w))))
            .cast("long").as("distinct_cust_7d"))
        .orderBy(col("day"))
    }),
    "q_window_sliding_hll" -> ((s, dir) => {
      // The 100 TB shape of the same query: per-day HLL sketches
      // (DataSketches hll_sketch_agg — fixed ~KB state per day
      // regardless of set size) merged across the 7-day frame with
      // hll_union_agg. No set materialization anywhere; this is also
      // the streaming-compatible formulation (sketches are mergeable
      // monoids). Driver gate (r9, was rows-only): sketch estimates
      // are engine-specific, so the gated output carries the exact
      // sibling's count plus `hll_ok` — estimate within 5% relative
      // error of exact (HLL lgK=12 standard error is ~0.8%, so 5% is
      // a hard property, not slack); the oracle computes the exact
      // count and asserts TRUE. WindowDistinctSpec still checks the
      // raw estimates.
      val daily = t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("day"), col("o_custkey"))
        .groupBy(col("day"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          collect_set(col("o_custkey")).as("cs"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy(unix_date(col("day"))).rangeBetween(-6, 0)
      daily.select(col("day"),
          sum(col("n_orders")).over(w).as("n_orders_7d"),
          size(array_distinct(flatten(collect_list(col("cs")).over(w))))
            .cast("long").as("exact_cust_7d"),
          hll_sketch_estimate(hll_union_agg(col("sk")).over(w))
            .as("approx_cust_7d"))
        .select(col("day"), col("n_orders_7d"), col("exact_cust_7d"),
          (abs(col("approx_cust_7d") - col("exact_cust_7d"))
            <= col("exact_cust_7d") * 0.05).as("hll_ok"))
        .orderBy(col("day"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_sliding_distinct" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey FROM orders),
        |days AS (SELECT DISTINCT day FROM daily)
        |SELECT t.day,
        |  COUNT(*) AS n_orders_7d,
        |  COUNT(DISTINCT x.o_custkey) AS distinct_cust_7d
        |FROM days t JOIN daily x ON x.day BETWEEN t.day - 6 AND t.day
        |GROUP BY t.day ORDER BY t.day""".stripMargin,
    // exact counts from the same 7-day self-join; hll_ok asserts the
    // engine's sketch estimate landed within the 5% bound (see query)
    "q_window_sliding_hll" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey FROM orders),
        |days AS (SELECT DISTINCT day FROM daily)
        |SELECT t.day,
        |  COUNT(*) AS n_orders_7d,
        |  COUNT(DISTINCT x.o_custkey) AS exact_cust_7d,
        |  TRUE AS hll_ok
        |FROM days t JOIN daily x ON x.day BETWEEN t.day - 6 AND t.day
        |GROUP BY t.day ORDER BY t.day""".stripMargin,
    "q_window_groups" ->
      """WITH b AS (
        |  SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS sd,
        |    l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS de
        |  FROM lineitem WHERE l_orderkey < 2000),
        |g1 AS (SELECT rf, sd, sum(de) AS gde, count(*) AS gn
        |       FROM b GROUP BY rf, sd),
        |gi AS (SELECT rf, sd, gde, gn,
        |         row_number() OVER (PARTITION BY rf ORDER BY sd) AS g
        |       FROM g1),
        |n1 AS (SELECT a.rf, a.sd, sum(x.gde) AS s11
        |       FROM gi a JOIN gi x ON x.rf = a.rf
        |         AND x.g BETWEEN a.g - 1 AND a.g + 1
        |       GROUP BY a.rf, a.sd),
        |n2 AS (SELECT a.rf, a.sd, sum(x.gn) AS c20
        |       FROM gi a JOIN gi x ON x.rf = a.rf
        |         AND x.g BETWEEN a.g - 2 AND a.g
        |       GROUP BY a.rf, a.sd)
        |SELECT b.k1, b.k2, CAST(n1.s11 AS DOUBLE) AS grp_sum,
        |  CAST(n2.c20 AS BIGINT) AS grp_cnt
        |FROM b JOIN n1 USING (rf, sd) JOIN n2 USING (rf, sd)
        |ORDER BY k1, k2""".stripMargin,
    "q_window_exclude" ->
      """WITH b AS (
        |  SELECT l_returnflag AS f, CAST(l_shipdate AS DATE) AS sd,
        |    l_orderkey AS k1, CAST(l_linenumber AS INT) AS k2,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS de
        |  FROM lineitem WHERE l_orderkey < 2000)
        |SELECT k1, k2,
        |  CAST(sum(de) OVER (PARTITION BY f ORDER BY sd, k1, k2, de
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |    EXCLUDE CURRENT ROW) AS DOUBLE) AS w_run_excl,
        |  count(*) OVER (PARTITION BY f ORDER BY sd, k1, k2, de
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
        |    EXCLUDE CURRENT ROW) AS w_cnt_excl,
        |  round(CAST(sum(de) OVER (PARTITION BY f
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |      EXCLUDE CURRENT ROW) AS DOUBLE)
        |    / (count(*) OVER (PARTITION BY f) - 1), 6) AS w_avg_excl,
        |  CAST(sum(de) OVER (PARTITION BY f ORDER BY sd
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS w_grp_excl,
        |  CAST(sum(de) OVER (PARTITION BY f ORDER BY sd
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS w_ties_excl
        |FROM b ORDER BY k1, k2""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS prk, ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM orders WHERE o_custkey < 40
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_window_frames" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   / COUNT(*) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg,
        |  COUNT(*) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |     RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM orders WHERE o_custkey < 40
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_window_range_interval" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  COUNT(*) OVER wt AS n_trail30,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wt AS DOUBLE) AS sum_trail30,
        |  COUNT(*) OVER wa AS n_next7
        |FROM orders WHERE o_custkey < 200
        |WINDOW wt AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW),
        |  wa AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN CURRENT ROW AND INTERVAL 7 DAY FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 2, 0.0) OVER w AS next2_price
        |FROM orders WHERE o_custkey < 40
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_totalprice) OVER w AS fv,
        |  LAST_VALUE(o_totalprice) OVER w AS lv,
        |  NTH_VALUE(o_totalprice, 2) OVER w AS nv2
        |FROM orders WHERE o_custkey < 40
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority, NTILE(4) OVER
        |  (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders WHERE o_custkey < 40
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_window_agg" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS part_qty,
        |  MIN(l_quantity) OVER w AS min_qty,
        |  MAX(l_quantity) OVER w AS max_qty,
        |  COUNT(*) OVER w AS n_part,
        |  ROUND(STDDEV_SAMP(l_quantity) OVER w, 6) AS sd_qty
        |FROM lineitem WHERE l_orderkey < 200
        |WINDOW w AS (PARTITION BY l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_distinct" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_returnflag) AS n_supp
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin,
    "q_window_distinct_rule_v2" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_returnflag) AS n_supp,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS sum_qty,
        |  COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_orderkey, l_linenumber, l_suppkey, l_partkey
        |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS run_supp
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, n_supp, sum_qty,
        |  run_supp""".stripMargin,
    "q_window_running_rev" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_rev
        |FROM lineitem WHERE l_suppkey < 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
  )
}
