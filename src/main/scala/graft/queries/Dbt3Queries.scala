package graft.queries

import org.apache.spark.sql.SparkSession

/** The DBT-3 (TPC-H derivative) query set — the reference's flagship
  * benchmark unit (`mysql-test/columnstore/autopilot/t/
  * mcs4007_autopilot_dbt3_performance_queries_1g.test:1-28`, schema
  * `mysql-test/columnstore/include/dbt3/createTables.inc`).
  *
  * q1/q3/q5/q6/q10 live in CoreQueries (round 1); this module adds the
  * remaining 17. The driver-generated testdata is a REDUCED TPC-H star
  * schema (no partsupp, no l_commitdate/l_receiptdate/l_shipmode, no
  * c_phone/p_container), so each query is a shape-preserving
  * adaptation: identical operator structure (join graph topology,
  * subquery kind, aggregation pattern) re-targeted at the columns that
  * exist. Where TPC-H walks partsupp, we use the lineitem fact as the
  * part↔supplier link — same join cardinality class, same plan shape.
  *
  * Every query is a single ANSI SQL text that runs unchanged on both
  * Spark and the DuckDB oracle. Exact-arithmetic discipline as in Q:
  * money aggregates over DECIMAL(18,2) (order-independent, matching
  * the reference's fixed-point engine `datatypes/mcs_decimal.h`), cast
  * to DOUBLE only at the end; integer SUMs cast to BIGINT because
  * DuckDB widens SUM(INT) to HUGEINT while Spark stays BIGINT.
  *
  * Scale notes (100 TB): all joins are equi-joins Catalyst can shuffle
  * or broadcast under AQE; no hard-coded broadcasts of scaling tables;
  * correlated subqueries (q2, q17, q20) decorrelate into aggregated
  * joins rather than per-row probes.
  */
object Dbt3Queries {
  import Q._

  private val dp = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  private val sameSql: Map[String, String] = Map(
    // Q2: min-cost supplier. partsupp → lineitem as the part↔supplier
    // link; ps_supplycost → s_acctbal as the minimized measure.
    "q2_mincost" ->
      s"""SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
         |FROM part, supplier, lineitem, nation, region
         |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |  AND p_size <= 15 AND p_type = 'LARGE'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND s_acctbal = (SELECT MAX(s2.s_acctbal)
         |                   FROM supplier s2, lineitem l2, nation n2, region r2
         |                   WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
         |                     AND s2.s_nationkey = n2.n_nationkey
         |                     AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    // Q4: order priority check. commitdate<receiptdate (late delivery)
    // → shipped more than 30 days after order date.
    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Q7: volume shipping between two nations by year.
    "q7_volume" ->
      s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         |             $dp AS volume
         |      FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |        AND c_custkey = o_custkey
         |        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
         |                           AND TIMESTAMP '1996-12-31 00:00:00') shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    // Q8: national market share within a region.
    "q8_mktshare" ->
      s"""SELECT o_year,
         |  CAST(SUM(CASE WHEN nat = 'NATION_5' THEN volume
         |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(SUM(volume) AS DOUBLE) AS mkt_share
         |FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |             $dp AS volume, n2.n_name AS nat
         |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
         |        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
         |                            AND TIMESTAMP '1996-12-31 00:00:00'
         |        AND p_type = 'ECONOMY') all_nations
         |GROUP BY o_year ORDER BY o_year""".stripMargin,

    // Q9: product-type profit. ps_supplycost*qty → p_retailprice*qty.
    "q9_profit" ->
      s"""SELECT nat, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
         |FROM (SELECT n_name AS nat,
         |             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         |             $dp - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
         |      FROM part, supplier, lineitem, orders, nation
         |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |        AND p_name LIKE '%widget%') profit
         |GROUP BY nat, o_year ORDER BY nat, o_year DESC""".stripMargin,

    // Q11: important stock. partsupp value → lineitem extended price by
    // part for one nation's suppliers; HAVING vs a global scalar.
    "q11_important" ->
      """SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
        |  (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.001
        |   FROM lineitem, supplier, nation
        |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    // Q12: shipping modes vs priority. l_shipmode → l_returnflag.
    "q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Q13: customer order-count distribution (left join + double agg).
    "q13_custdist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q14: promotion effect. p_type LIKE 'PROMO%' → p_type = 'PROMO'.
    "q14_promo" ->
      s"""SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $dp
         |                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / CAST(SUM($dp) AS DOUBLE) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,

    // Q15: top supplier (CTE referenced twice + scalar MAX).
    "q15_topsupp" ->
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, CAST(SUM($dp) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, revenue0
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin,

    // Q16: supplier count by part attrs, NOT IN "complaints" analog.
    "q16_suppcnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 32, 38, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // Q17: small-quantity-order revenue (correlated AVG subquery; the
    // scalar is computed as exact-decimal-sum/count so both engines
    // evaluate bit-identical doubles regardless of row order).
    "q17_smallqty" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_type = 'SMALL'
        |  AND l_quantity < (SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q18: large-volume customers (IN over grouped HAVING).
    "q18_largevol" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 210)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // Q19: discounted revenue — disjunction of conjunctive predicate
    // groups sharing the join key (the common-conjunction-extraction
    // rewrite, ref `dbcon/execplan/rewrites.h:36`; Catalyst must pull
    // p_partkey = l_partkey out of the OR so the join stays equi).
    "q19_discrev" ->
      s"""SELECT CAST(SUM($dp) AS DOUBLE) AS revenue
         |FROM lineitem, part
         |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
         |       AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
         |       AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_partkey = l_partkey AND p_brand = 'Brand#3'
         |       AND p_size BETWEEN 1 AND 40 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // Q20: potential part promotion (nested IN chain + grouped HAVING).
    "q20_potential" ->
      """SELECT s_suppkey, s_name
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_8'
        |ORDER BY s_name""".stripMargin,

    // Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS over
    // the same fact with inequality correlation. "received late" →
    // shipped last among a multi-supplier order.
    "q21_waiting" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_12'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    // Q22: global sales opportunity. c_phone country code →
    // c_nationkey; "customers with no orders" → "no URGENT orders"
    // (every customer here has orders, so the original anti-join is
    // vacuous); scalar AVG as exact decimal sum / count for
    // cross-engine determinism.
    "q22_global" ->
      """SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM (SELECT CAST(c_nationkey AS INT) AS cntrycode, c_acctbal, c_custkey
        |      FROM customer
        |      WHERE c_nationkey IN (13, 21, 23, 9, 20, 18, 17)
        |        AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                         FROM customer c2
        |                         WHERE c2.c_acctbal > 0.00
        |                           AND c2.c_nationkey IN (13, 21, 23, 9, 20, 18, 17))) custsale
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  )

  val queries: Map[String, QFn] = sameSql.map { case (n, s) =>
    n -> ((sp: SparkSession, dir: String) => Q.sql(sp, dir, s))
  }

  val oracle: Map[String, String] = sameSql
}
