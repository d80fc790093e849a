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
}
