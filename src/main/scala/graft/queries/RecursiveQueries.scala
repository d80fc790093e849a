package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Recursion

/** Recursive-query surface (`WITH RECURSIVE` through the reference's
  * MariaDB front end) — evaluated by `operators/Recursion` fixpoint
  * iteration, hash-matched against DuckDB's native recursive CTEs.
  *
  * The hierarchy is derived deterministically from the customer table
  * (parent = c_custkey div 10, roots = keys < 10): a 4-level tree that
  * exists at every SF with no extra fixture. The transition graph for
  * the reachability query comes from consecutive event pairs per user —
  * cyclic by nature, exercising the UNION-distinct termination rule.
  * All outputs are integers/strings: engine-exact compares.
  */
object RecursiveQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_recursive_chain" -> ((s, dir) => {
      // root / depth / materialized path for every node of the tree
      val cust = t(s, dir, "customer").select(col("c_custkey").as("ckey"))
      val base = cust.filter(col("ckey") < 10)
        .select(col("ckey"), col("ckey").as("root"),
          lit(0).as("depth"), col("ckey").cast("string").as("path"))
      val edges = cust.filter(col("ckey") >= 10)
        .select(col("ckey").as("child"), expr("ckey div 10").as("parent"))
      Recursion.iterate(base, fr =>
        edges.join(fr, edges("parent") === fr("ckey"))
          .select(col("child").as("ckey"), col("root"),
            (col("depth") + 1).as("depth"),
            concat(col("path"), lit("/"), col("child").cast("string")).as("path"))
      ).orderBy(col("ckey"))
    }),
    "q_recursive_sum" -> ((s, dir) => {
      // subtree rollup per root: descendant count + exact balance total
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("ckey"), col("c_acctbal"))
      val base = cust.filter(col("ckey") < 10)
        .select(col("ckey"), col("ckey").as("root"))
      val edges = cust
        .select(col("ckey").as("child"), expr("ckey div 10").as("parent"))
        .filter(col("child") >= 10)
      val closure = Recursion.iterate(base, fr =>
        edges.join(fr, edges("parent") === fr("ckey"))
          .select(col("child").as("ckey"), col("root")))
      closure.join(cust, "ckey")
        .groupBy(col("root"))
        .agg(count(lit(1)).as("n_nodes"), sumDec(col("c_acctbal")).as("total_bal"))
        .orderBy(col("root"))
    }),
    "q_recursive_reach" -> ((s, dir) => {
      // reachable event types from 'view' over the (cyclic) transition
      // graph of consecutive same-user events — UNION-distinct recursion
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = t(s, dir, "events")
        .select(col("event_type").as("src"), lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull && col("src") =!= col("dst"))
        .distinct()
      import s.implicits._
      val base = Seq("view").toDF("node")
      Recursion.iterateDistinct(base, fr =>
        edges.join(fr, edges("src") === fr("node")).select(col("dst").as("node")),
        maxIter = 50
      ).orderBy(col("node"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_recursive_chain" ->
      """WITH RECURSIVE r AS (
        |  SELECT c_custkey AS ckey, c_custkey AS root, 0 AS depth,
        |         CAST(c_custkey AS VARCHAR) AS path
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, r.root, r.depth + 1,
        |         r.path || '/' || CAST(c.c_custkey AS VARCHAR)
        |  FROM customer c JOIN r ON (c.c_custkey // 10) = r.ckey
        |  WHERE c.c_custkey >= 10)
        |SELECT ckey, root, depth, path FROM r ORDER BY ckey""".stripMargin,
    "q_recursive_sum" ->
      s"""WITH RECURSIVE r AS (
        |  SELECT c_custkey AS ckey, c_custkey AS root
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, r.root
        |  FROM customer c JOIN r ON (c.c_custkey // 10) = r.ckey
        |  WHERE c.c_custkey >= 10)
        |SELECT r.root, CAST(count(*) AS BIGINT) AS n_nodes,
        |       ${oSumDec("c.c_acctbal")} AS total_bal
        |FROM r JOIN customer c ON c.c_custkey = r.ckey
        |GROUP BY r.root ORDER BY r.root""".stripMargin,
    "q_recursive_reach" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT event_type AS src,
        |           lead(event_type) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS dst
        |    FROM events) t
        |  WHERE dst IS NOT NULL AND src <> dst),
        |r AS (
        |  SELECT 'view' AS node
        |  UNION
        |  SELECT e.dst FROM edges e JOIN r ON e.src = r.node)
        |SELECT node FROM r ORDER BY node""".stripMargin
  )
}
