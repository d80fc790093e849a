package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The DISTINCT-over-window resolution rule (plans/WindowDistinct):
  * semantics against independently-computed expectations, and plan
  * shape — whole-partition distincts must take the aggregate+join-back
  * path (bounded state), never materialize a per-row set. */
class WindowDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1, 10.0), ("a", 1, 20.0), ("a", 2, 20.0), ("a", 2, 30.0),
    ("b", 5, 1.0), ("b", 5, 1.0), ("b", 6, 2.0),
    (null.asInstanceOf[String], 9, 4.0), (null.asInstanceOf[String], 9, 5.0)
  ).toDF("g", "k", "v")

  test("COUNT(DISTINCT) OVER whole partition — SQL and DataFrame paths") {
    df.createOrReplaceTempView("wd")
    val sql = spark.sql(
      "SELECT g, k, COUNT(DISTINCT k) OVER (PARTITION BY g) AS cd FROM wd")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // group a: ks {1,2} → 2; b: {5,6} → 2; NULL group: {9} → 1 (the
    // null-safe join keeps NULL partitions — window semantics)
    assert(sql(("a", 1)) == 2 && sql(("a", 2)) == 2)
    assert(sql(("b", 5)) == 2 && sql(("b", 6)) == 2)
    assert(sql((null, 9)) == 1, "NULL partition key must survive the join-back")

    val api = df.select(col("g"), col("k"),
        countDistinct(col("k")).over(Window.partitionBy(col("g"))).as("cd"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(api == sql, "DataFrame countDistinct.over ≡ SQL path")
  }

  test("SUM/AVG(DISTINCT) OVER whole partition match exact models") {
    df.createOrReplaceTempView("wd")
    val r = spark.sql(
      """SELECT g, CAST(SUM(DISTINCT CAST(v AS DECIMAL(18,2))) OVER (PARTITION BY g) AS DOUBLE) AS sd,
        |       CAST(AVG(DISTINCT CAST(v AS DECIMAL(18,2))) OVER (PARTITION BY g) AS DOUBLE) AS ad
        |FROM wd""".stripMargin)
      .collect().map(x => Option(x.getString(0)) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(Some("a")) == ((60.0, 20.0)), "a: distinct {10,20,30}")
    assert(r(Some("b")) == ((3.0, 1.5)), "b: distinct {1,2}")
    assert(r(None) == ((9.0, 4.5)), "null group: distinct {4,5}")
  }

  test("whole-partition plan is join-back (no per-row set); framed is collect_set") {
    df.createOrReplaceTempView("wd")
    val whole = spark.sql(
      "SELECT COUNT(DISTINCT k) OVER (PARTITION BY g) AS cd FROM wd")
    val wplan = whole.queryExecution.optimizedPlan.toString
    assert(!wplan.contains("collect_set"),
      s"whole-partition distinct must not materialize sets per row:\n$wplan")
    assert(wplan.contains("Join"), s"expected aggregate join-back:\n$wplan")

    val framed = spark.sql(
      """SELECT COUNT(DISTINCT k) OVER (PARTITION BY g ORDER BY k
        |ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS cd FROM wd""".stripMargin)
    assert(framed.queryExecution.optimizedPlan.toString.contains("collect_set"),
      "framed distinct count rides collect_set over the frame")
    val got = spark.sql(
      """SELECT g, k, COUNT(DISTINCT k) OVER (PARTITION BY g ORDER BY k
        |ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS cd FROM wd
        |ORDER BY g NULLS LAST, k""".stripMargin)
      .collect().map(_.getLong(2)).toSeq
    // a ks sorted: 1,1,2,2 → frames [1],[1,1],[1,2],[2,2] → 1,1,2,1
    // b: 5,5,6 → 1,1,2 ; null: 9,9 → 1,1
    assert(got == Seq(1L, 1L, 2L, 1L, 1L, 1L, 2L, 1L, 1L))
  }

  test("mixed distinct + plain window functions keep their values and order") {
    df.createOrReplaceTempView("wd")
    val r = spark.sql(
      """SELECT g, k, v,
        |  COUNT(DISTINCT k) OVER (PARTITION BY g) AS cd,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) OVER (PARTITION BY g) AS DOUBLE) AS sv,
        |  ROW_NUMBER() OVER (PARTITION BY g ORDER BY k, v) AS rn
        |FROM wd WHERE g = 'a' ORDER BY rn""".stripMargin).collect()
    assert(r.map(_.getLong(3)).forall(_ == 2L))
    assert(r.map(_.getDouble(4)).forall(_ == 80.0))
    assert(r.map(_.getInt(5)).toSeq == Seq(1, 2, 3, 4))
  }

  test("sliding HLL distinct tracks the exact sliding distinct within sketch error") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.WindowQueries.queries("q_window_sliding_distinct")(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    val approx = graft.queries.WindowQueries.queries("q_window_sliding_hll")(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(2).toDouble).toMap
    assert(exact.keySet == approx.keySet, "same day grain")
    // default lgConfigK=12 → relative standard error ~1.6%; assert a
    // generous 3σ envelope (counts here are small, so also allow ±2)
    exact.foreach { case (day, n) =>
      val est = approx(day)
      assert(math.abs(est - n) <= math.max(2.0, 0.05 * n),
        s"day $day: exact $n vs HLL $est")
    }
  }
}
