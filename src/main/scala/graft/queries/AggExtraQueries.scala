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
    "q_agg_pctdisc" ->
      s"""SELECT l_returnflag,
         |  quantile_disc(l_quantity, 0.5) AS p50_disc,
         |  quantile_disc(l_quantity, 0.9) AS p90_disc,
         |  CAST(SUM(DISTINCT ${oDec("l_quantity")}) AS DOUBLE) / COUNT(DISTINCT ${oDec("l_quantity")}) AS avg_distinct
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
