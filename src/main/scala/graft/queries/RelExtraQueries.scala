package graft.queries

import org.apache.spark.sql.functions._

/** Relational-surface extras beyond the core operator suite: LATERAL
  * correlated subqueries, PIVOT/UNPIVOT reshaping, non-hierarchical
  * GROUPING SETS, the FILTER aggregate clause, and generator/
  * higher-order array functions — each hash-matched against a DuckDB
  * formulation of the same semantics (CASE-based pivot, UNION ALL
  * unpivot, list_* HOFs), so the compare pins semantics, not syntax.
  * All aggregates follow the exact-decimal pattern in `Q`; generator
  * arithmetic is integer-only — engine-exact.
  */
object RelExtraQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_lateral_topk" -> ((s, dir) => {
      // per-nation top-2 customers by balance, as a true correlated
      // LATERAL subquery (Spark plans the rewrite; DuckDB runs native)
      sql(s, dir,
        """SELECT n.n_name, c.c_name, c.c_acctbal
          |FROM nation n JOIN LATERAL (
          |  SELECT c_name, c_acctbal FROM customer
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
          |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
    }),
    "q_pivot" -> ((s, dir) => {
      // returnflag × linestatus quantity matrix (explicit value list —
      // no value-discovery scan, the planner knows the output schema)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sumDec(col("l_quantity")))
        .orderBy(col("l_returnflag"))
    }),
    "q_unpivot" -> ((s, dir) => {
      // melt one order's-worth of measures back to rows
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "measure", valueColumnName = "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))
    }),
    "q_agg_groupsets" -> ((s, dir) => {
      // non-hierarchical sets — (nation), (priority), (): not a rollup
      sql(s, dir,
        """SELECT n_name, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
          |ORDER BY n_name, o_orderpriority""".stripMargin)
    }),
    "q_agg_filter" -> ((s, dir) => {
      // FILTER clause: per-priority counts/sums under different predicates
      sql(s, dir,
        """SELECT o_orderpriority,
          |  CAST(count(*) AS BIGINT) AS n_all,
          |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS total_high,
          |  CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
          |    AS BIGINT) AS cust_open
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),
    "q_fn_generator" -> ((s, dir) => {
      // sequence generator + higher-order fns, integer-exact arithmetic
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), col("p_size"),
          aggregate(sequence(lit(1L), col("p_size").cast("long")), lit(0L),
            (a, x) => a + x * x).as("sum_sq"),
          size(filter(sequence(lit(1L), col("p_size").cast("long")),
            x => x % 7 === 0)).as("n_div7"),
          array_join(transform(slice(sequence(lit(1L), col("p_size").cast("long")), 1, 3),
            x => (x * 10).cast("string")), ",").as("head3x10"))
        .orderBy(col("p_partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_lateral_topk" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n JOIN LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c ON true
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,
    "q_pivot" ->
      s"""SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      """WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 500 = 0)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |       l_quantity AS val FROM f
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM f
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM f
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q_agg_groupsets" ->
      """SELECT n_name, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_agg_filter" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS total_high,
        |  CAST(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
        |    AS BIGINT) AS cust_open
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_fn_generator" ->
      """SELECT p_partkey, p_size,
        |  CAST(list_sum(list_transform(range(1, p_size + 1), x -> x * x))
        |    AS BIGINT) AS sum_sq,
        |  CAST(len(list_filter(range(1, p_size + 1), x -> x % 7 = 0))
        |    AS INTEGER) AS n_div7,
        |  array_to_string(list_transform(range(1, p_size + 1)[1:3],
        |    x -> CAST(x * 10 AS VARCHAR)), ',') AS head3x10
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin
  )
}
