package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.ConcatAggs

/** Aggregate-surface parity: GROUP_CONCAT / JSON_ARRAYAGG (custom
  * TypedImperativeAggregates, ref `dbcon/joblist/groupconcat.cpp`,
  * `jsonarrayagg.cpp`) plus the small reference holes VERDICT r1
  * flagged: REGR_SXX/SXY/SYY (ref `utils/regr/regr_sxx.cpp` etc.),
  * PERCENTILE_DISC (ref `utils/windowfunction/wf_percentile.cpp`),
  * AVG(DISTINCT) (ref `utils/rowgroup/rowaggregation.h:65-119`).
  *
  * REGR_S** note: Spark ships regr_sxx/sxy/syy builtins, but their
  * float accumulation is partition-order-dependent — at Σx² ~ 1e14
  * the low bits differ run to run, which both breaks the oracle hash
  * and makes 100-TB results nondeterministic. Following the engine's
  * exact-DECIMAL discipline (Q.scala), they are computed here from
  * their definitions over exact decimal sums:
  *   SXX = Σx² − (Σx)²/n,  SYY = Σy² − (Σy)²/n,  SXY = Σxy − ΣxΣy/n
  * with the single division done in double at the end — deterministic
  * under any partitioning, on both engines.
  */
object AggExtraQueries {
  import Q._

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  // exact decimal Σ, rendered double only at the end
  private def sxx(x: Column, n: Column): Column =
    (sum(dec2(x) * dec2(x)).cast(DoubleType)
      - sum(dec2(x)).cast(DoubleType) * sum(dec2(x)).cast(DoubleType) / n)
  private def sxy(x: Column, y: Column, n: Column): Column =
    (sum(dec2(x) * dec2(y)).cast(DoubleType)
      - sum(dec2(x)).cast(DoubleType) * sum(dec2(y)).cast(DoubleType) / n)

  private def oSxx(x: String): String =
    s"CAST(SUM(${oDec(x)} * ${oDec(x)}) AS DOUBLE) - CAST(SUM(${oDec(x)}) AS DOUBLE) * CAST(SUM(${oDec(x)}) AS DOUBLE) / COUNT(*)"
  private def oSxy(x: String, y: String): String =
    s"CAST(SUM(${oDec(x)} * ${oDec(y)}) AS DOUBLE) - CAST(SUM(${oDec(x)}) AS DOUBLE) * CAST(SUM(${oDec(y)}) AS DOUBLE) / COUNT(*)"

  val queries: Map[String, QFn] = Map(
    // GROUP_CONCAT with ORDER BY / SEPARATOR / DISTINCT / DESC and
    // JSON_ARRAYAGG with ORDER BY, over the SQL registration surface.
    "q_agg_groupconcat" -> ((s, dir) => {
      ConcatAggs.register(s)
      Q.sql(s, dir,
        """SELECT n_regionkey,
          |  group_concat(n_name, n_name, ',') AS names,
          |  group_concat_desc(n_name, n_name, ',') AS names_desc,
          |  json_arrayagg(n_name, n_name) AS names_json
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),
    "q_agg_groupconcat2" -> ((s, dir) => {
      ConcatAggs.register(s)
      // value ordered by an unrelated numeric key + DISTINCT over a
      // repeating value domain (the GroupConcatOrderBy shape).
      Q.sql(s, dir,
        """SELECT s_nationkey,
          |  group_concat(s_name, s_acctbal, '|') AS by_bal,
          |  group_concat_distinct(substr(s_name, 1, 11), substr(s_name, 1, 11), '+') AS dist_prefix
          |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    }),
    "q_agg_regr_s" -> ((s, dir) => {
      val n = count(lit(1))
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(sxx(col("l_quantity"), n), 4).as("sxx"),
          round(sxx(col("l_extendedprice"), n) / 1e6, 4).as("syy_m"),
          round(sxy(col("l_quantity"), col("l_extendedprice"), n) / 1e3, 4).as("sxy_k"),
          n.as("n"))
        .orderBy(col("l_returnflag"))
    }),
    "q_abc_analysis" -> ((s, dir) => {
      // Pareto / ABC classification of parts by revenue: exact-DECIMAL
      // cumulative revenue through BOTH window sums (running + whole),
      // so segment-tree vs running-sum window evaluation can't move a
      // bit; the one double division producing the share is
      // deterministic. The windows run over the parts-sized AGGREGATE
      // (not lineitem) — at catalog scale swap for quantile-threshold
      // classing, same downstream.
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("rev_dec"))
      val ord = Window.orderBy(col("rev_dec").desc, col("l_partkey"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      rev.withColumn("share", d(sum(col("rev_dec")).over(run)) /
          d(sum(col("rev_dec")).over(whole)))
        .withColumn("cls", when(col("share") <= 0.8, "A")
          .when(col("share") <= 0.95, "B").otherwise("C"))
        .select(col("l_partkey"), d(col("rev_dec")).as("revenue"),
          round(col("share"), 6).as("share"), col("cls"))
        .orderBy(col("share"), col("l_partkey"))
    }),
    "q_basket_lift" -> ((s, dir) => {
      // Market-basket association: support/confidence/lift for part
      // pairs co-occurring in >= 3 orders. All counts integer; each
      // metric is one double division of exact int64 products —
      // engine-deterministic. Pair generation is the same
      // support-floored basket self-join as the triangle edges.
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val nOrders = op.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
      val item = op.groupBy(col("p")).agg(count(lit(1)).as("c"))
      val pairs = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
        .agg(count(lit(1)).as("cab")).filter(col("cab") >= 3)
      pairs
        .join(item.select(col("p").as("pa"), col("c").as("ca")), "pa")
        .join(item.select(col("p").as("pb"), col("c").as("cb")), "pb")
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("cab"),
          round(col("cab") / col("n_orders"), 6).as("support"),
          round(col("cab") / col("ca"), 6).as("confidence"),
          round((col("cab") * col("n_orders")) / (col("ca") * col("cb")), 6)
            .as("lift"))
        .orderBy(col("lift").desc, col("pa"), col("pb"))
        .limit(50)
    }),
    "q_agg_pctdisc" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50_disc"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90_disc"),
          (sum_distinct(dec2(col("l_quantity"))).cast(DoubleType) /
            countDistinct(dec2(col("l_quantity")))).as("avg_distinct"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_agg_groupconcat" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names,
        |  string_agg(n_name, ',' ORDER BY n_name DESC) AS names_desc,
        |  '[' || string_agg(to_json(n_name), ',' ORDER BY n_name) || ']' AS names_json
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_agg_groupconcat2" ->
      """SELECT s_nationkey,
        |  string_agg(s_name, '|' ORDER BY s_acctbal) AS by_bal,
        |  string_agg(DISTINCT substring(s_name, 1, 11), '+' ORDER BY substring(s_name, 1, 11)) AS dist_prefix
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_agg_regr_s" ->
      s"""SELECT l_returnflag,
         |  ROUND(${oSxx("l_quantity")}, 4) AS sxx,
         |  ROUND((${oSxx("l_extendedprice")}) / 1e6, 4) AS syy_m,
         |  ROUND((${oSxy("l_quantity", "l_extendedprice")}) / 1e3, 4) AS sxy_k,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_abc_analysis" ->
      """WITH rev AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM lineitem GROUP BY l_partkey),
        |s AS (
        |  SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS revenue,
        |    CAST(sum(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(sum(rev_dec) OVER () AS DOUBLE) AS share
        |  FROM rev)
        |SELECT l_partkey, revenue, round(share, 6) AS share,
        |  CASE WHEN share <= 0.8 THEN 'A' WHEN share <= 0.95 THEN 'B'
        |       ELSE 'C' END AS cls
        |FROM s ORDER BY share, l_partkey""".stripMargin,
    "q_basket_lift" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
        |item AS (SELECT p, count(*) AS c FROM op GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb, count(*) AS cab
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT pa, pb, CAST(cab AS BIGINT) AS cab,
        |  round(cab / n.n_orders, 6) AS support,
        |  round(cab / ia.c, 6) AS confidence,
        |  round((cab * n.n_orders) / (ia.c * ib.c), 6) AS lift
        |FROM pairs JOIN item ia ON ia.p = pairs.pa
        |JOIN item ib ON ib.p = pairs.pb CROSS JOIN n
        |ORDER BY lift DESC, pa, pb LIMIT 50""".stripMargin,
    "q_agg_pctdisc" ->
      s"""SELECT l_returnflag,
         |  quantile_disc(l_quantity, 0.5) AS p50_disc,
         |  quantile_disc(l_quantity, 0.9) AS p90_disc,
         |  CAST(SUM(DISTINCT ${oDec("l_quantity")}) AS DOUBLE) / COUNT(DISTINCT ${oDec("l_quantity")}) AS avg_distinct
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
