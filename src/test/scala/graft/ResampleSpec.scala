package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Grid/fill semantics on handcrafted series — the cases the oracle
  * hash-match can't isolate: grid bounds are per key, LOCF never
  * leaks across keys, interpolation hits exact midpoints, and the
  * trailing-gap fallback is LOCF not NULL. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("timeGrid spans each key's own [min,max]; regularize nulls the gaps") {
    val obs = Seq(
      (1L, d("2024-01-01"), 10.0), (1L, d("2024-01-04"), 40.0),
      (2L, d("2024-02-10"), 5.0)
    ).toDF("k", "day", "v")
    val grid = Resample.regularize(obs, "k", "day", "1 day")
    val rows = grid.orderBy("k", "day")
      .as[(Long, Date, Option[Double])].collect().toSeq
    assert(rows.map(_._1).count(_ == 1L) == 4)      // jan 1..4
    assert(rows.map(_._1).count(_ == 2L) == 1)      // single-point span
    assert(rows.filter(_._1 == 1L).map(_._3) ==
      Seq(Some(10.0), None, None, Some(40.0)))
  }

  test("fillForward carries per key and keeps leading nulls") {
    val grid = Seq(
      (1L, d("2024-01-01"), Option.empty[Double]), // leading null stays
      (1L, d("2024-01-02"), Some(7.0)),
      (1L, d("2024-01-03"), Option.empty[Double]),
      (2L, d("2024-01-03"), Option.empty[Double])  // other key must not see 7.0
    ).toDF("k", "day", "v")
    val got = Resample.fillForward(grid, "k", "day", Seq("v"))
      .orderBy("k", "day").as[(Long, Date, Option[Double])].collect().toSeq
    assert(got.map(_._3) == Seq(None, Some(7.0), Some(7.0), None))
  }

  test("interpolate: exact midpoints, pass-through observations, trailing LOCF") {
    val obs = Seq(
      (1L, d("2024-01-01"), 10.0),
      (1L, d("2024-01-05"), 30.0), // gap of 3 -> 15, 20, 25
      (1L, d("2024-01-07"), 30.0)
    ).toDF("k", "day", "v")
    val reg = Resample.regularize(obs, "k", "day", "1 day")
      // append a trailing grid row beyond the last obs to test fallback
      .unionByName(Seq((1L, d("2024-01-08"), Option.empty[Double]))
        .toDF("k", "day", "v"))
    val got = Resample.interpolate(reg, "k", "day", "v",
        pos = datediff(col("day"), to_date(lit("2024-01-01"))))
      .orderBy("day").as[(Long, Date, Double)].collect().map(_._3).toSeq
    assert(got == Seq(10.0, 15.0, 20.0, 25.0, 30.0, 30.0, 30.0, 30.0))
  }

  test("ewma: recursive fold matches closed form, seeds at x1, isolates keys") {
    // (key, ord, tiebreak, x); key 2 checks ties break on the third col
    val src = Seq(
      (1L, 1L, 0L, 8.0), (1L, 2L, 0L, 4.0), (1L, 3L, 0L, 0.0),
      (2L, 1L, 2L, 100.0), (2L, 1L, 1L, 0.0)
    ).toDS()
    val got = Resample.ewma(src, alpha = 0.5)
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // key 1: y1=8, y2=.5*4+.5*8=6, y3=.5*0+.5*6=3
    assert(got.filter(_._1 == 1L).map(_._4) == Seq(8.0, 6.0, 3.0))
    // key 2: tie on ord -> tiebreak orders (0.0 first): y1=0, y2=50
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._4)) ==
      Seq((1L, 0.0), (2L, 50.0)))
  }

  test("holt: level/trend recursion matches hand-computed values") {
    val src = Seq((1L, 1L, 0L, 10.0), (1L, 2L, 0L, 20.0), (1L, 3L, 0L, 30.0)).toDS()
    val got = Resample.holt(src, alpha = 0.5, beta = 0.5)
      .collect().sortBy(_._2).toSeq
    // rn2: l=.5*20+.5*10=15, b=.5*5=2.5; rn3: l=.5*30+.5*17.5=23.75,
    // b=.5*8.75+.5*2.5=5.625
    assert(got.map(r => (r._4, r._5)) ==
      Seq((10.0, 0.0), (15.0, 2.5), (23.75, 5.625)))
  }

  test("holtWinters: seasonal ring recursion matches hand-computed values") {
    val src = Seq((1L, 1L, 0L, 10.0), (1L, 2L, 0L, 20.0), (1L, 3L, 0L, 30.0)).toDS()
    val got = Resample.holtWinters(src, alpha = 0.5, beta = 0.5, gamma = 0.5,
        period = 2)
      .collect().sortBy(_._2).toSeq
    // t2: l=.5*20+.5*10=15, b=2.5, s=.5*(20-15)=2.5
    // t3 reads s_1 (=0): l=.5*30+.5*17.5=23.75, b=5.625, s=3.125
    assert(got.map(r => (r._4, r._5, r._6)) ==
      Seq((10.0, 0.0, 0.0), (15.0, 2.5, 2.5), (23.75, 5.625, 3.125)))
  }

  test("cusum: one-sided sums clamp at zero and alarm past h") {
    val src = Seq(12.0, 13.0, 9.0, 5.0, 5.0).zipWithIndex
      .map { case (x, i) => (1L, i.toLong, 0L, x) }.toDS()
    val got = Resample.cusum(src, target = 10.0, slack = 1.0, h = 5.0)
      .collect().sortBy(_._2).toSeq
    assert(got.map(_._4) == Seq(1.0, 3.0, 1.0, 0.0, 0.0))      // sp
    assert(got.map(_._5) == Seq(0.0, 0.0, 0.0, -4.0, -8.0))    // sn
    assert(got.map(_._6) == Seq(false, false, false, false, true))
  }
}
