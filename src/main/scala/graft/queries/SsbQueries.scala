package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star Schema Benchmark — the reference's second end-to-end
  * correctness suite (`mysql-test/columnstore/include/ssb/
  * createTables.inc`, `ldiTables1g.inc`; run by the autopilot SSB
  * tests). All 13 queries (flights 1–4), shape-preserving over the
  * driver's TPC-H-style schema:
  *
  *   lineorder    → lineitem ⋈ orders (the fact, denormalized on the fly)
  *   date dim     → year/month/week derived from l_shipdate
  *   part         → p_brand (brand), p_type (category analog)
  *   supplier dim → supplier ⋈ nation ⋈ region; CITY surrogate =
  *                  n_name||'_'||key%10 (the testdata has no city
  *                  column; same dim hierarchy region⊃nation⊃city)
  *   customer dim → customer ⋈ nation ⋈ region, same city surrogate
  *
  * Join topology, filter hierarchy (flight 1 date-only → flight 4
  * three-dim), group-bys and the revenue/profit aggregates match the
  * published SSB definitions. Exact-decimal money arithmetic
  * throughout (Q.scala pattern), so every query is DuckDB
  * hash-checkable.
  *
  * Scale shape: nation/region are broadcast (fixed 25/5 rows);
  * part/supplier/customer ride AQE's runtime broadcast decision
  * (they scale with SF); the fact join l⋈o shuffles on orderkey —
  * the co-partitioned key both sides already bucket by in the
  * reference's DBT-3 layout. */
object SsbQueries {
  import Q._

  private def lo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))

  private def suppDim(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"),
        col("n_name").as("s_nation"), col("r_name").as("s_region"),
        concat(col("n_name"), lit("_"),
          (col("s_suppkey") % 10).cast("int")).as("s_city"))

  private def custDim(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"),
        col("n_name").as("c_nation"), col("r_name").as("c_region"),
        concat(col("n_name"), lit("_"),
          (col("c_custkey") % 10).cast("int")).as("c_city"))

  /** SSB revenue = extendedprice × discount (flight 1). */
  private val rev1: Column = dec(col("l_extendedprice")) * dec(col("l_discount"))
  /** SSB revenue = extendedprice × (1 − discount) (flights 2–4). */
  private val rev: Column =
    dec(col("l_extendedprice")) * (oneDec - dec(col("l_discount")))
  /** Supplycost analog: quantity × retailprice (summed exactly;
    * profit = revenue − cost/100 resolves in double at the end). */
  private val cost: Column = dec(col("l_quantity")) * dec(col("p_retailprice"))

  private val yr: Column = year(col("l_shipdate")).cast("int").as("d_year")

  val queries: Map[String, QFn] = Map(
    "q_ssb_q1_1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1996 &&
          col("l_discount").between(0.01, 0.03) && col("l_quantity") < 25)
        .agg(d(sum(rev1)).as("revenue"))),
    "q_ssb_q1_2" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1996 && month(col("l_shipdate")) === 1 &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity").between(26, 35))
        .agg(d(sum(rev1)).as("revenue"))),
    "q_ssb_q1_3" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(weekofyear(col("l_shipdate")) === 6 && year(col("l_shipdate")) === 1996 &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity").between(26, 35))
        .agg(d(sum(rev1)).as("revenue"))),

    "q_ssb_q2_1" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("p_type") === "SMALL" && col("s_region") === "ASIA")
        .groupBy(yr, col("p_brand"))
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),
    "q_ssb_q2_2" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("p_brand").between("Brand#12", "Brand#18") &&
          col("s_region") === "AMERICA")
        .groupBy(yr, col("p_brand"))
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),
    "q_ssb_q2_3" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("p_brand") === "Brand#14" && col("s_region") === "EUROPE")
        .groupBy(yr, col("p_brand"))
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),

    "q_ssb_q3_1" -> ((s, dir) =>
      lo(s, dir)
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_region") === "ASIA" && col("s_region") === "ASIA" &&
          year(col("l_shipdate")).between(1996, 1998))
        .groupBy(col("c_nation"), col("s_nation"), yr)
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year").asc, col("revenue").desc)),
    "q_ssb_q3_2" -> ((s, dir) =>
      lo(s, dir)
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nation") === "NATION_10" && col("s_nation") === "NATION_10" &&
          year(col("l_shipdate")).between(1996, 1998))
        .groupBy(col("c_city"), col("s_city"), yr)
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year").asc, col("revenue").desc)),
    "q_ssb_q3_3" -> ((s, dir) =>
      lo(s, dir)
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nation").isin("NATION_5", "NATION_10") &&
          col("s_nation").isin("NATION_5", "NATION_10") &&
          year(col("l_shipdate")).between(1996, 1998))
        .groupBy(col("c_city"), col("s_city"), yr)
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year").asc, col("revenue").desc)),
    "q_ssb_q3_4" -> ((s, dir) =>
      lo(s, dir)
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nation").isin("NATION_5", "NATION_10") &&
          col("s_nation").isin("NATION_5", "NATION_10") &&
          year(col("l_shipdate")) === 1997 && month(col("l_shipdate")) === 12)
        .groupBy(col("c_city"), col("s_city"), yr)
        .agg(d(sum(rev)).as("revenue"))
        .orderBy(col("d_year").asc, col("revenue").desc)),

    "q_ssb_q4_1" -> ((s, dir) =>
      lo(s, dir)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_region") === "AMERICA" && col("s_region") === "AMERICA" &&
          col("p_type").isin("ECONOMY", "STANDARD"))
        .groupBy(yr, col("c_nation"))
        .agg((d(sum(rev)) - d(sum(cost)) / 100.0).as("profit"))
        .orderBy(col("d_year"), col("c_nation"))),
    "q_ssb_q4_2" -> ((s, dir) =>
      lo(s, dir)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("c_region") === "AMERICA" && col("s_region") === "AMERICA" &&
          year(col("l_shipdate")).isin(1997, 1998) &&
          col("p_type").isin("ECONOMY", "STANDARD"))
        .groupBy(yr, col("s_nation"), col("p_type"))
        .agg((d(sum(rev)) - d(sum(cost)) / 100.0).as("profit"))
        .orderBy(col("d_year"), col("s_nation"), col("p_type"))),
    "q_ssb_q4_3" -> ((s, dir) =>
      lo(s, dir)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .join(custDim(s, dir), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, dir), col("l_suppkey") === col("s_suppkey"))
        .where(col("s_nation") === "NATION_3" &&
          year(col("l_shipdate")).isin(1997, 1998))
        .groupBy(yr, col("s_city"), col("p_brand"))
        .agg((d(sum(rev)) - d(sum(cost)) / 100.0).as("profit"))
        .orderBy(col("d_year"), col("s_city"), col("p_brand"))))

  // ---- DuckDB oracle ----

  private val oRev1 = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))"
  private val oRev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
  private val oCost = "CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))"
  private val oProfit =
    s"CAST(SUM($oRev) AS DOUBLE) - CAST(SUM($oCost) AS DOUBLE) / 100.0 AS profit"

  private val oSupp =
    """supplier JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey""".stripMargin
  private val sCity = "sn.n_name || '_' || CAST(s_suppkey % 10 AS INT)"
  private val oCust =
    """customer JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey""".stripMargin
  private val cCity = "cn.n_name || '_' || CAST(c_custkey % 10 AS INT)"

  val oracle: Map[String, String] = Map(
    "q_ssb_q1_1" ->
      s"""SELECT CAST(SUM($oRev1) AS DOUBLE) AS revenue FROM lineitem
         |WHERE year(l_shipdate) = 1996 AND l_discount BETWEEN 0.01 AND 0.03
         |  AND l_quantity < 25""".stripMargin,
    "q_ssb_q1_2" ->
      s"""SELECT CAST(SUM($oRev1) AS DOUBLE) AS revenue FROM lineitem
         |WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 1
         |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 26 AND 35""".stripMargin,
    "q_ssb_q1_3" ->
      s"""SELECT CAST(SUM($oRev1) AS DOUBLE) AS revenue FROM lineitem
         |WHERE weekofyear(l_shipdate) = 6 AND year(l_shipdate) = 1996
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35""".stripMargin,
    "q_ssb_q2_1" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, p_brand,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE p_type = 'SMALL' AND sr.r_name = 'ASIA'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ssb_q2_2" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, p_brand,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE p_brand BETWEEN 'Brand#12' AND 'Brand#18' AND sr.r_name = 'AMERICA'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ssb_q2_3" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, p_brand,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE p_brand = 'Brand#14' AND sr.r_name = 'EUROPE'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ssb_q3_1" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
         |  CAST(year(l_shipdate) AS INT) AS d_year,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
         |  AND year(l_shipdate) BETWEEN 1996 AND 1998
         |GROUP BY 1, 2, 3 ORDER BY d_year ASC, revenue DESC""".stripMargin,
    "q_ssb_q3_2" ->
      s"""SELECT $cCity AS c_city, $sCity AS s_city,
         |  CAST(year(l_shipdate) AS INT) AS d_year,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cn.n_name = 'NATION_10' AND sn.n_name = 'NATION_10'
         |  AND year(l_shipdate) BETWEEN 1996 AND 1998
         |GROUP BY 1, 2, 3 ORDER BY d_year ASC, revenue DESC""".stripMargin,
    "q_ssb_q3_3" ->
      s"""SELECT $cCity AS c_city, $sCity AS s_city,
         |  CAST(year(l_shipdate) AS INT) AS d_year,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cn.n_name IN ('NATION_5', 'NATION_10')
         |  AND sn.n_name IN ('NATION_5', 'NATION_10')
         |  AND year(l_shipdate) BETWEEN 1996 AND 1998
         |GROUP BY 1, 2, 3 ORDER BY d_year ASC, revenue DESC""".stripMargin,
    "q_ssb_q3_4" ->
      s"""SELECT $cCity AS c_city, $sCity AS s_city,
         |  CAST(year(l_shipdate) AS INT) AS d_year,
         |  CAST(SUM($oRev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cn.n_name IN ('NATION_5', 'NATION_10')
         |  AND sn.n_name IN ('NATION_5', 'NATION_10')
         |  AND year(l_shipdate) = 1997 AND month(l_shipdate) = 12
         |GROUP BY 1, 2, 3 ORDER BY d_year ASC, revenue DESC""".stripMargin,
    "q_ssb_q4_1" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, cn.n_name AS c_nation,
         |  $oProfit
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
         |  AND p_type IN ('ECONOMY', 'STANDARD')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_ssb_q4_2" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, sn.n_name AS s_nation,
         |  p_type, $oProfit
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
         |  AND year(l_shipdate) IN (1997, 1998)
         |  AND p_type IN ('ECONOMY', 'STANDARD')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_ssb_q4_3" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS d_year, $sCity AS s_city,
         |  p_brand, $oProfit
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN $oCust ON o_custkey = c_custkey
         |JOIN $oSupp ON l_suppkey = s_suppkey
         |WHERE sn.n_name = 'NATION_3' AND year(l_shipdate) IN (1997, 1998)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
}
