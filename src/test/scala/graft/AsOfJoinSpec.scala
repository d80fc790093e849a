package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics: backward match, equal-ts inclusion,
  * no-match nulls, and tolerance windows. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private val left = Seq(
    (1L, ts(10), "a"), (1L, ts(20), "b"), (2L, ts(5), "c"), (3L, ts(1), "d")
  ).toDF("k", "ts", "x")
  private val right = Seq(
    (1L, ts(8), 100.0), (1L, ts(15), 200.0), (1L, ts(20), 300.0), (4L, ts(0), 400.0)
  ).toDF("k", "ts", "pv")

  test("backward as-of: latest right <= left.ts, ties included, no-match null") {
    val r = AsOfJoin.backward(left, right, "k", "ts")
      .select(col("x"), col("_asof.pv"), col("_asof_ts"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    assert(r == Map("a" -> 100.0, "b" -> 300.0, "c" -> null, "d" -> null))
  }

  test("tolerance drops matches older than the window") {
    val r = AsOfJoin.backward(left, right, "k", "ts",
        tolerance = expr("INTERVAL 3 MINUTE"))
      .select(col("x"), col("_asof.pv"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    // 'a' at 10:10 vs purchase at 10:08 -> within 3 min; 'b' at 10:20
    // matches the 10:20 purchase exactly
    assert(r == Map("a" -> 100.0, "b" -> 300.0, "c" -> null, "d" -> null))
    val tight = AsOfJoin.backward(left, right, "k", "ts",
        tolerance = expr("INTERVAL 1 MINUTE"))
      .select(col("x"), col("_asof.pv"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    assert(tight == Map("a" -> null, "b" -> 300.0, "c" -> null, "d" -> null))
  }

  test("forward as-of: earliest right >= left.ts, ties included") {
    val r = AsOfJoin.forward(left, right, "k", "ts")
      .select(col("x"), col("_asof.pv"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    // a@10:10 -> 10:15; b@10:20 -> same-instant 10:20; c,d no right key
    assert(r == Map("a" -> 200.0, "b" -> 300.0, "c" -> null, "d" -> null))
    val tight = AsOfJoin.forward(left, right, "k", "ts",
        tolerance = expr("INTERVAL 3 MINUTE"))
      .select(col("x"), col("_asof.pv"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    // a@10:10 -> 10:15 is 5 min ahead: outside the 3-min window
    assert(tight == Map("a" -> null, "b" -> 300.0, "c" -> null, "d" -> null))
  }

  test("nearest as-of: closer side wins, backward wins exact ties") {
    // a@10:10: back=10:08 (2 min) vs fwd=10:15 (5 min) -> backward
    val r = AsOfJoin.nearest(left, right, "k", "ts")
      .select(col("x"), col("_asof.pv"))
      .collect().map(row => (row.getString(0),
        if (row.isNullAt(1)) null else row.getDouble(1))).toMap
    assert(r == Map("a" -> 100.0, "b" -> 300.0, "c" -> null, "d" -> null))
    // equidistant case: left at 10:10 with rights at 10:08/10:12
    val l2 = Seq((9L, ts(10), "z")).toDF("k", "ts", "x")
    val r2 = Seq((9L, ts(8), 1.0), (9L, ts(12), 2.0)).toDF("k", "ts", "pv")
    val tie = AsOfJoin.nearest(l2, r2, "k", "ts")
      .select(col("_asof.pv")).collect().head.getDouble(0)
    assert(tie == 1.0) // backward on ties (pandas merge_asof convention)
    // tolerance bounds both directions
    val none = AsOfJoin.nearest(l2, r2, "k", "ts",
        tolerance = expr("INTERVAL 1 MINUTE"))
      .select(col("_asof.pv")).collect().head
    assert(none.isNullAt(0))
  }
}
