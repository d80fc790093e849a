package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Plan pins for the global rank-filter shape. A candidate custom
  * rewrite (threshold-join the k-th key back onto the scan) was built
  * and DISCARDED this round: Spark 4's own `InferWindowGroupLimit`
  * already plans `rank()/row_number() OVER (ORDER BY ...) <= k` with a
  * PARTIAL WindowGroupLimit below the single-partition exchange — each
  * task forwards at most k rows, so the exchange moves k·P rows, not
  * the table. These tests pin that contract (and the correctness
  * around it) so a Spark upgrade that loses the partial step fails
  * loudly instead of silently reintroducing the full-table
  * single-partition sort. */
class GlobalTopKSpec extends SparkSpec {
  import spark.implicits._

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rank<=k over global order plans a Partial WindowGroupLimit below the exchange") {
    val orders = Tables.t(spark, sfDir, "orders")
    val w = Window.orderBy(col("o_orderkey").desc)
    val df = orders.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 7)
      .select(col("o_orderkey"), col("rnk"))
    val plan = physical(df)
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"partial group-limit missing — global rank filter would move the full table:\n$plan")
    val expect = orders.select(col("o_orderkey"))
      .orderBy(col("o_orderkey").desc).limit(7)
      .collect().map(_.getLong(0)).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.keySet == expect)
    assert(got.values.toSeq.sorted == (1 to 7))
  }

  test("rank keeps boundary ties (WITH TIES); row_number trims them") {
    val df = Seq((1L, 10), (2L, 20), (3L, 20), (4L, 30), (5L, 40)).toDF("id", "v")
    val byV = Window.orderBy(col("v"))
    val ranked = df.withColumn("r", rank().over(byV)).filter(col("r") <= 3)
    assert(ranked.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(df.withColumn("r", row_number().over(byV)).filter(col("r") < 3).count() == 2)
  }

  test("nullable key: NULLS FIRST rows occupy the top ranks correctly") {
    val nullable = Seq((Some(1), 1), (None, 2), (Some(3), 3)).toDF("k", "x")
    val got = nullable.withColumn("r", rank().over(Window.orderBy(col("k"))))
      .filter(col("r") <= 2).select("x").as[Int].collect().toSet
    assert(got == Set(2, 1))
  }
}
