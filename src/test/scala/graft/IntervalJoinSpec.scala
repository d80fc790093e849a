package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Interval-overlap join (`operators/IntervalJoin.scala`): endpoint
  * semantics, exactly-once emission across shared buckets, grain
  * independence, and equivalence with the brute-force inequality
  * join. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:${m / 60}%02d:${m % 60}%02d")

  private def iv(rows: (Int, String, Int, Int)*): DataFrame =
    rows.map { case (id, k, s, e) => (id.toLong, k, ts(s), ts(e)) }
      .toDF("id", "k", "s", "e")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("l_id", "r_id").as[(Long, Long)].collect().toSet

  test("endpoints: touching intervals match (closed); disjoint and cross-key do not") {
    val l = iv((1, "a", 0, 60), (2, "a", 200, 260), (3, "b", 0, 60))
    val r = iv((10, "a", 60, 120), (11, "a", 61, 120), (12, "a", 300, 360),
      (13, "b", 30, 40))
    val got = pairs(IntervalJoin.overlap(l, r, "k", "s", "e", bucketSeconds = 30))
    // 1-10 touch at t=60 (closed: match); 1-11 disjoint by 1s;
    // 2-* disjoint; 3-13 nested, same key; 1-13 overlaps but key b≠a
    assert(got == Set((1L, 10L), (3L, 13L)))
  }

  test("exactly-once: a pair sharing many buckets emits one row") {
    val l = iv((1, "a", 0, 600))
    val r = iv((10, "a", 0, 600), (11, "a", 599, 800))
    val out = IntervalJoin.overlap(l, r, "k", "s", "e", bucketSeconds = 10)
    assert(out.count() === 2)
    assert(pairs(out) == Set((1L, 10L), (1L, 11L)))
  }

  test("grain independence + brute-force equivalence on a generated set") {
    // deterministic pseudo-random intervals over 3 keys
    val rows = (1 to 120).map { i =>
      val start = (i * 37) % 500
      (i, s"k${i % 3}", start, start + (i * 13) % 90)
    }
    val df = iv(rows: _*)
    val brute = df.as("a").join(df.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    for (grain <- Seq(7L, 60L, 300L)) {
      val got = pairs(IntervalJoin.overlap(df, df, "k", "s", "e", grain)
        .where(col("l_id") < col("r_id")))
      assert(got == brute, s"grain $grain")
    }
  }
}
