package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: dense per-key time grids and gap
  * filling (LOCF + linear interpolation) — the resampling pass event
  * and metric pipelines need before window math is meaningful
  * (irregular observations → fixed-step series). The reference covers
  * the calendar arithmetic (func_timestampdiff/period fns); the grid
  * and fill are the Spark-native layer on top.
  *
  * Scale design: the grid is generated PER KEY from that key's own
  * [min, max] span (`sequence` + explode inside the scan — never a
  * cross join against a global calendar table), so grid volume is
  * Σ_key span/step, and every fill is a per-key ordered window — ONE
  * shuffle keyed by the series key, partial-aggregation-friendly
  * upstream. Nothing global, nothing driver-side.
  */
object Resample {

  /** Dense per-key grid: one row per `step` tick covering each key's
    * observed [min(time), max(time)] span. `step` is an interval
    * literal body, e.g. "1 day" / "6 hours". */
  def timeGrid(obs: DataFrame, key: String, time: String,
      step: String): DataFrame =
    obs.groupBy(col(key)).agg(min(col(time)).as("_t0"), max(col(time)).as("_t1"))
      .select(col(key),
        explode(sequence(col("_t0"), col("_t1"), expr(s"interval $step"))).as(time))

  /** Observations left-joined onto the dense grid — missing ticks
    * surface as NULL measure columns, ready for a fill policy. */
  def regularize(obs: DataFrame, key: String, time: String,
      step: String): DataFrame =
    timeGrid(obs, key, time, step).join(obs, Seq(key, time), "left")

  /** LOCF (last observation carried forward) over each key's series
    * for every column in `cols`. Leading NULLs (before the first
    * observation) stay NULL. */
  def fillForward(grid: DataFrame, key: String, time: String,
      cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(grid) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Linear interpolation of `value` across gaps: a missing tick gets
    * vp + (vn − vp)·(pos − pp)/(pn − pp) from the surrounding
    * observations, where `pos` is a numeric position expression for
    * the tick (days since epoch, unix seconds, ...) — the caller
    * chooses the axis so date and timestamp grids both work. A
    * trailing gap (no next observation) falls back to LOCF; observed
    * ticks pass through bit-unchanged. Two per-key windows (backward
    * carry, forward carry) — still one shuffle: same partitioning. */
  def interpolate(grid: DataFrame, key: String, time: String,
      value: String, pos: Column): DataFrame = {
    val back = Window.partitionBy(col(key)).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward carry as the RUNNING frame of the reverse order: a
    // (current → unbounded following) frame is O(n²) per partition in
    // Spark's evaluator (recomputed per row); the reversed running
    // frame is O(n). Grid times are unique per key, so the reversed
    // sort is a true mirror. Same partitioning — still one shuffle.
    val fwdRev = Window.partitionBy(col(key)).orderBy(col(time).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsPos = when(col(value).isNotNull, pos)
    val vp = last(col(value), ignoreNulls = true).over(back)
    val pp = last(obsPos, ignoreNulls = true).over(back)
    val vn = last(col(value), ignoreNulls = true).over(fwdRev)
    val pn = last(obsPos, ignoreNulls = true).over(fwdRev)
    grid.withColumn(value,
      when(col(value).isNotNull, col(value))
        .when(vn.isNull, vp)
        .when(vp.isNull, vn)
        .otherwise(vp + (vn - vp) *
          ((pos - pp).cast("double") / (pn - pp).cast("double"))))
  }

  /** Exponentially weighted moving average — the RECURSIVE smoother
    * y_t = α·x_t + (1−α)·y_{t−1}, seeded y_1 = x_1. No window frame
    * can express it (every output depends on the full prefix through
    * a non-associative fold), and the closed-form rewrite
    * α·Σ(1−α)^(t−i)·x_i overflows past ~1000 rows — so this is the
    * documented legitimate case for a per-group sequential scan:
    * `flatMapSortedGroups` shuffles once by key, sorts each group by
    * (time, tiebreak) inside the shuffle (no extra exchange), and
    * folds each series with O(1) state. At 100 TB this is exactly one
    * shuffle of (key, ts, tie, x) narrow rows; series never
    * materialize in memory (iterator in, iterator out).
    *
    * Returns (key, rn, x, ewma) where rn is the 1-based position in
    * the series — emitted by the fold itself so callers don't pay a
    * second window pass for row numbering. α must be given as an
    * exactly-representable double (0.25, 0.5, …) if bit-reproducible
    * cross-engine output is required. */
  def ewma(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)],
      alpha: Double): org.apache.spark.sql.Dataset[(Long, Long, Double, Double)] = {
    import ds.sparkSession.implicits._
    // sort expressions resolve against the underlying plan's column
    // names, not tuple positions — normalize them first
    val named = ds.toDF("_1", "_2", "_3", "_4").as[(Long, Long, Long, Double)]
    named.groupByKey(_._1).flatMapSortedGroups($"_2", $"_3") { (k, it) =>
      var prev = 0.0
      var seeded = false
      var rn = 0L
      it.map { case (_, _, _, x) =>
        prev = if (!seeded) { seeded = true; x }
               else alpha * x + (1 - alpha) * prev
        rn += 1
        (k, rn, x, prev)
      }
    }
  }

  /** Holt double-exponential smoothing — level + trend:
    * l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1}),
    * b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}, seeded l_1 = x_1,
    * b_1 = 0. Same execution shape as [[ewma]] (one shuffle, in-sort
    * fold, O(1) state per series). Returns
    * (key, rn, x, level, trend); the one-step-ahead forecast is
    * level + trend. α/β exactly-representable doubles keep the
    * output bit-reproducible cross-engine. */
  def holt(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)],
      alpha: Double, beta: Double)
      : org.apache.spark.sql.Dataset[(Long, Long, Double, Double, Double)] = {
    import ds.sparkSession.implicits._
    val named = ds.toDF("_1", "_2", "_3", "_4").as[(Long, Long, Long, Double)]
    named.groupByKey(_._1).flatMapSortedGroups($"_2", $"_3") { (k, it) =>
      var l = 0.0
      var b = 0.0
      var rn = 0L
      it.map { case (_, _, _, x) =>
        rn += 1
        if (rn == 1L) { l = x; b = 0.0 }
        else {
          val nl = alpha * x + (1 - alpha) * (l + b)
          b = beta * (nl - l) + (1 - beta) * b
          l = nl
        }
        (k, rn, x, l, b)
      }
    }
  }

  /** Holt-Winters ADDITIVE triple exponential smoothing — level +
    * trend + a `period`-slot seasonal component:
    * l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},
    * s_t = γ(x_t − l_t) + (1−γ)s_{t−m};
    * seeded l_1 = x_1, b_1 = 0, pre-window seasonals 0 (indices are
    * LEARNED over the first cycles rather than pre-estimated — the
    * deterministic-init variant, so both engines can replay it
    * exactly). Same one-shuffle sorted fold as [[ewma]]; per-series
    * state is period + 2 doubles (the seasonal ring). Returns
    * (key, rn, x, level, trend, season). */
  def holtWinters(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)],
      alpha: Double, beta: Double, gamma: Double, period: Int)
      : org.apache.spark.sql.Dataset[(Long, Long, Double, Double, Double, Double)] = {
    import ds.sparkSession.implicits._
    require(period >= 1)
    val named = ds.toDF("_1", "_2", "_3", "_4").as[(Long, Long, Long, Double)]
    named.groupByKey(_._1).flatMapSortedGroups($"_2", $"_3") { (k, it) =>
      val seas = new Array[Double](period)
      var l = 0.0
      var b = 0.0
      var rn = 0L
      it.map { case (_, _, _, x) =>
        rn += 1
        val idx = ((rn - 1) % period).toInt // slot of s_{t−m} (ring)
        val sm = seas(idx)
        if (rn == 1L) { l = x; b = 0.0 }
        else {
          val nl = alpha * (x - sm) + (1 - alpha) * (l + b)
          b = beta * (nl - l) + (1 - beta) * b
          l = nl
        }
        val ns = gamma * (x - l) + (1 - gamma) * sm
        seas(idx) = ns
        (k, rn, x, l, b, ns)
      }
    }
  }

  /** Tabular CUSUM change detection (Page): the recursive pair
    * sp_t = max(0, sp_{t−1} + (x_t − target − slack)),
    * sn_t = min(0, sn_{t−1} + (x_t − target + slack)),
    * both starting from 0 BEFORE the first observation (so row 1
    * already applies the step). A drift alarm fires when sp > h or
    * sn < −h. Same one-shuffle sorted-fold shape as [[ewma]].
    * Returns (key, rn, x, sp, sn, alarm). */
  def cusum(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)],
      target: Double, slack: Double, h: Double)
      : org.apache.spark.sql.Dataset[(Long, Long, Double, Double, Double, Boolean)] = {
    import ds.sparkSession.implicits._
    val named = ds.toDF("_1", "_2", "_3", "_4").as[(Long, Long, Long, Double)]
    named.groupByKey(_._1).flatMapSortedGroups($"_2", $"_3") { (k, it) =>
      var sp = 0.0
      var sn = 0.0
      var rn = 0L
      it.map { case (_, _, _, x) =>
        rn += 1
        sp = math.max(0.0, sp + (x - target - slack))
        sn = math.min(0.0, sn + (x - target + slack))
        (k, rn, x, sp, sn, sp > h || sn < -h)
      }
    }
  }
}
