package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Resample

/** Time-series regularization queries: per-user daily series from the
  * events stream, gap-filled on a dense grid — LOCF for counts,
  * linear interpolation for totals. Oracles rebuild the grid with
  * generate_series + the same window carries; the interpolation
  * formula is replayed term for term (integer day distances cast to
  * double, identical op order) so doubles compare bit-exact.
  */
object ResampleQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_acf" -> ((s, dir) => {
      // Autocorrelation function, lags 1–7, of each event type's daily
      // total — the pre-model diagnostic that sizes AR terms and
      // confirms weekly seasonality. Fully relational: lag columns via
      // ONE window pass (never a self-join per lag), moments as exact
      // DECIMAL sums, and the mean-centered expansion
      //   r_k = (Σxy − x̄(Σh+Σt) + n_k·x̄²) / (Σx² − n·x̄²)
      // evaluated in a mirrored double sequence so DuckDB replays it
      // bit-exactly. Scales: one type-keyed shuffle; series length is
      // calendar-bounded.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val withLags = daily.select(col("event_type") +: col("x") +:
        (1 to 7).map(k => lag(col("x"), k).over(w).as(s"l$k")): _*)
      val pairs = withLags.select(col("event_type"), col("x"),
          explode(array((1 to 7).map(k =>
            struct(lit(k).as("lag"), col(s"l$k").as("xl"))): _*)).as("p"))
        .select(col("event_type"), col("p.lag").as("lag"),
          col("x"), col("p.xl").as("xl"))
        .filter(col("xl").isNotNull)
      val perLag = pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("nk"), sum(col("x") * col("xl")).as("sxy"),
          sum(col("x")).as("sh"), sum(col("xl")).as("st"))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("sxx"))
      val mean = col("s").cast("double") / col("n")
      perLag.join(tot, "event_type")
        .select(col("event_type"), col("lag"), col("n").as("n_days"),
          col("nk"),
          round((col("sxy").cast("double") - mean * (col("sh") + col("st")).cast("double")
              + col("nk") * mean * mean)
            / (col("sxx").cast("double") - col("n") * mean * mean), 6).as("acf"))
        .orderBy(col("event_type"), col("lag"))
    }),
    "q_ljung_box" -> ((s, dir) => {
      // Ljung–Box portmanteau whiteness test on the same lag-1..7
      // autocorrelations: Q = n(n+2)·Σ r_k²/(n−k), df = 7, rejected
      // at the χ²₀.₀₅ critical value. The 7 per-lag double terms are
      // floor-grid quantized (1e12) before the cross-row sum so the
      // total is order-independent — the one place a 7-term double
      // sum could diverge between engines.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
      val withLags = daily.select(col("event_type") +: col("x") +:
        (1 to 7).map(k => lag(col("x"), k).over(w).as(s"l$k")): _*)
      val pairs = withLags.select(col("event_type"), col("x"),
          explode(array((1 to 7).map(k =>
            struct(lit(k).as("lag"), col(s"l$k").as("xl"))): _*)).as("p"))
        .select(col("event_type"), col("p.lag").as("lag"),
          col("x"), col("p.xl").as("xl"))
        .filter(col("xl").isNotNull)
      val perLag = pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("nk"), sum(col("x") * col("xl")).as("sxy"),
          sum(col("x")).as("sh"), sum(col("xl")).as("st"))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("sxx"))
      val mean = col("s").cast("double") / col("n")
      val r = round((col("sxy").cast("double") - mean * (col("sh") + col("st")).cast("double")
          + col("nk") * mean * mean)
        / (col("sxx").cast("double") - col("n") * mean * mean), 6)
      perLag.join(tot, "event_type")
        .select(col("event_type"), col("n"),
          floor(r * r / (col("n") - col("lag")) * lit(1e12)).as("qterm"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_days"),
          round((max(col("n")) * (max(col("n")) + 2)).cast("double")
            * (sum(col("qterm")).cast("double") / lit(1e12)), 6).as("q_stat"))
        .withColumn("whiteness_rejected", col("q_stat") > 14.067140)
        .orderBy(col("event_type"))
    }),
    "q_mann_kendall" -> ((s, dir) => {
      // Mann–Kendall monotone-trend test per event type: S = Σ_{i<j}
      // sign(x_j − x_i) over the day-ordered series, tie-corrected
      // variance, normal z. Sign statistics are ALL-INTEGER (exact
      // decimal compares → ±1/0), so only the final z touches doubles
      // — the robust trend test that needs no distributional
      // assumptions. Pair volume is quadratic in CALENDAR DAYS (series
      // length), not event volume — bounded regardless of corpus size.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
        .withColumn("rn", row_number().over(w))
      val sStat = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.rn") < col("b.rn"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s_stat"))
      val ties = daily.groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("tc"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("tc") * (col("tc") - 1) * (col("tc") * 2 + 5)).as("tie_term"),
          sum(col("tc")).as("n"))
      val varNum = col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_term")
      sStat.join(ties, "event_type")
        .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          varNum.as("var18"),
          round(when(col("s_stat") > 0,
              (col("s_stat") - 1).cast("double") / sqrt(varNum.cast("double") / 18))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(varNum.cast("double") / 18))
            .otherwise(lit(0.0)), 6).as("z"),
          when(col("s_stat") > 0, lit("increasing"))
            .when(col("s_stat") < 0, lit("decreasing"))
            .otherwise(lit("none")).as("direction"))
        .orderBy(col("event_type"))
    }),
    "q_theil_sen" -> ((s, dir) => {
      // Theil–Sen robust slope per event type: the LOWER MEDIAN of all
      // pairwise slopes (x_j−x_i)/(d_j−d_i) over the daily series —
      // selection only (row_number at ⌈m/2⌉ with (slope, i, j) ties),
      // no interpolation arithmetic, so the double survives the
      // cross-engine hash bit-exact. Pair volume is quadratic in
      // CALENDAR DAYS, bounded regardless of event volume; the
      // breakdown point (29% outliers) is what OLS slope lacks.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("dk", unix_date(col("day")))
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") && col("a.rn") < col("b.rn"))
        .select(col("a.event_type").as("event_type"),
          col("a.rn").as("i"), col("b.rn").as("j"),
          ((col("b.x") - col("a.x")).cast("double")
            / (col("b.dk") - col("a.dk")).cast("double")).as("slope"))
      val m = pairs.groupBy(col("event_type")).agg(count(lit(1)).as("n_pairs"))
      val sel = Window.partitionBy(col("event_type"))
        .orderBy(col("slope"), col("i"), col("j"))
      pairs.withColumn("rk", row_number().over(sel))
        .join(m, "event_type")
        .filter(col("rk") === ((col("n_pairs") + 1) / 2).cast("long"))
        .select(col("event_type"), col("n_pairs"),
          round(col("slope"), 6).as("ts_slope"))
        .orderBy(col("event_type"))
    }),
    "q_changepoint" -> ((s, dir) => {
      // Single-changepoint screen (binary segmentation, first split):
      // the day r maximizing the between-segment score
      // (P_r·n − S·r)²/(r(n−r)) — prefix sums are EXACT decimals via
      // one ordered window, the score is a mirrored double sequence,
      // and the argmax tie-breaks on the earlier day. One window pass
      // + one ranking per type; no pairwise work.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("p", sum(col("x")).over(cum))
      val tot = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val scored = daily.join(tot, "event_type")
        .filter(col("rn") < col("n"))
        .withColumn("dev",
          col("p").cast("double") * col("n") - col("s").cast("double") * col("rn"))
        .withColumn("score",
          col("dev") * col("dev") / (col("rn") * (col("n") - col("rn"))).cast("double"))
      val best = Window.partitionBy(col("event_type"))
        .orderBy(col("score").desc, col("rn"))
      scored.withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_days"),
          col("day").as("split_day"), col("rn").as("split_idx"),
          round(col("score"), 4).as("score"),
          round(col("p").cast("double") / col("rn"), 6).as("mean_left"),
          round((col("s") - col("p")).cast("double") / (col("n") - col("rn")), 6)
            .as("mean_right"))
        .orderBy(col("event_type"))
    }),
    "q_resample_locf" -> ((s, dir) => {
      val obs = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("n"))
      Resample.fillForward(
          Resample.regularize(obs, "user_id", "day", "1 day"),
          "user_id", "day", Seq("n"))
        .orderBy(col("user_id"), col("day"))
    }),
    "q_seasonal_decomp" -> ((s, dir) => {
      // Classical additive decomposition of each event type's daily
      // series: trend = centered 7-day MA (DECIMAL through the window
      // sum so segment-tree vs running-sum evaluation order can't
      // matter), seasonal = day-of-week mean of the detrended values
      // (folded over a day-SORTED array for a deterministic float
      // total), residual = the rest. Only full-window days emit.
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(dec(col("value"))).as("v_dec"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val trended = daily
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("trend", d(sum(col("v_dec")).over(w)) / 7)
        .filter(col("n_win") === 7)
        .withColumn("v", d(col("v_dec")))
        .withColumn("det", col("v") - col("trend"))
        .withColumn("dow", dayofweek(col("day")).cast("int"))
      val seasonal = trended.groupBy(col("event_type"), col("dow"))
        .agg((expr("aggregate(array_sort(collect_list(struct(day, det))), " +
            "cast(0 as double), (a, x) -> a + x.det)") / count(lit(1)))
          .as("seasonal"))
      trended.join(seasonal, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), round(col("v"), 6).as("v"),
          round(col("trend"), 6).as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          round(col("det") - col("seasonal"), 6).as("residual"))
        .orderBy(col("event_type"), col("day"))
    }),
    "q_walkforward" -> ((s, dir) => {
      // Walk-forward (expanding-window) time-series CV folds: quartile
      // boundaries from percentile_disc on event time (broadcast
      // thresholds + scan-side bucketing — never a global sort), fold
      // k trains on quartiles <= k and tests on quartile k+1. The
      // leakage-free temporal complement of q_split_leakfree. Output
      // is the per-(fold, role) audit a training job logs.
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"))
      val b = e.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY t)").as("b1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY t)").as("b2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY t)").as("b3"))
      e.crossJoin(broadcast(b))
        .withColumn("qt", lit(1) + (col("t") > col("b1")).cast("int")
          + (col("t") > col("b2")).cast("int")
          + (col("t") > col("b3")).cast("int"))
        .withColumn("fold", explode(sequence(lit(1), lit(3))))
        .withColumn("role", when(col("qt") <= col("fold"), "train")
          .when(col("qt") === col("fold") + 1, "test"))
        .filter(col("role").isNotNull)
        .groupBy(col("fold").cast("int").as("fold"), col("role"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("t")).as("min_t"), max(col("t")).as("max_t"))
        .orderBy(col("fold"), col("role"))
    }),
    "q_resample_ohlc" -> ((s, dir) => {
      // OHLC bars: weekly open/high/low/close per event type. Open and
      // close are min_by/max_by over the total (ts, event_id) order —
      // partial-aggregable (each map task ships ONE candidate row per
      // group), where the window formulation the oracle replays would
      // full-sort every partition. Total is the exact-decimal sum.
      val e = t(s, dir, "events")
      val ord = struct(col("ts"), col("event_id"))
      e.groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("timestamp_ntz").as("wk"))
        .agg(min_by(col("value"), ord).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), ord).as("close"),
          count(lit(1)).as("n"),
          sumDec(col("value")).as("total"))
        .orderBy(col("event_type"), col("wk"))
    }),
    "q_ewma" -> ((s, dir) => {
      // Recursive exponential smoothing over each user's event-value
      // series. α = 0.25 (exact double) and the fold computes
      // 0.25·x + 0.75·prev in fixed order, so DuckDB's recursive-CTE
      // replay of the same recurrence matches BIT-EXACT — a hash
      // match here proves the sequential fold is the standard
      // semantics, not an approximation of it.
      import s.implicits._
      val src = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value").cast("double"))
        .as[(Long, Long, Long, Double)]
      Resample.ewma(src, alpha = 0.25)
        .toDF("user_id", "rn", "x", "ewma")
        .orderBy(col("user_id"), col("rn"))
    }),
    "q_holt" -> ((s, dir) => {
      // Holt level+trend smoothing, same sorted-fold execution as
      // q_ewma; DuckDB replays the two mutually-recursive states in
      // one recursive CTE (the recursive term computes the new level
      // in a subquery so the trend update can reference it). α=0.5,
      // β=0.25 — exact doubles, identical op order, bit-exact match.
      import s.implicits._
      val src = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value").cast("double"))
        .as[(Long, Long, Long, Double)]
      Resample.holt(src, alpha = 0.5, beta = 0.25)
        .toDF("user_id", "rn", "x", "level", "trend")
        .orderBy(col("user_id"), col("rn"))
    }),
    "q_holt_winters" -> ((s, dir) => {
      // Additive Holt-Winters with a 7-slot seasonal ring (α=0.5,
      // β=γ=0.25 — exact doubles). DuckDB carries the ring as a LIST
      // column through the recursive CTE (head = s_{t−m}, push-back on
      // update), mirroring the fold's arithmetic op for op — the
      // seasonal recursion matches bit-exact.
      import s.implicits._
      val src = t(s, dir, "events").filter(col("user_id") < 25)
        .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value").cast("double"))
        .as[(Long, Long, Long, Double)]
      Resample.holtWinters(src, alpha = 0.5, beta = 0.25, gamma = 0.25,
          period = 7)
        .toDF("user_id", "rn", "x", "level", "trend", "season")
        .orderBy(col("user_id"), col("rn"))
    }),
    "q_cusum" -> ((s, dir) => {
      // Page's tabular CUSUM drift detector over each user's series
      // (target 50, slack 1.5, alarm threshold 100) — the recursive
      // max(0, ...)/min(0, ...) pair no window frame can express.
      import s.implicits._
      val src = t(s, dir, "events").filter(col("user_id") < 40)
        .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("value").cast("double"))
        .as[(Long, Long, Long, Double)]
      Resample.cusum(src, target = 50.0, slack = 1.5, h = 100.0)
        .toDF("user_id", "rn", "x", "sp", "sn", "alarm")
        .orderBy(col("user_id"), col("rn"))
    }),
    "q_resample_interp" -> ((s, dir) => {
      val obs = t(s, dir, "events").filter(col("user_id") < 20)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
        .groupBy(col("user_id"), col("day"))
        .agg(sumDec(col("value")).as("v"))
      Resample.interpolate(
          Resample.regularize(obs, "user_id", "day", "1 day"),
          "user_id", "day", "v",
          pos = datediff(col("day"), to_date(lit("2024-01-01"))))
        .orderBy(col("user_id"), col("day"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM daily),
        |tot AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS sxx
        |  FROM idx GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type, k.lag, a.x, b.x AS xl
        |  FROM idx a JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) k(lag) ON true
        |  JOIN idx b ON b.event_type = a.event_type AND b.rn = a.rn - k.lag),
        |pl AS (SELECT event_type, lag, COUNT(*) AS nk, SUM(x*xl) AS sxy,
        |  SUM(x) AS sh, SUM(xl) AS st FROM pairs GROUP BY 1, 2)
        |SELECT p.event_type, CAST(p.lag AS INT) AS lag, t.n AS n_days, p.nk,
        |  round((CAST(p.sxy AS DOUBLE)
        |      - (CAST(t.s AS DOUBLE)/t.n) * CAST(p.sh + p.st AS DOUBLE)
        |      + p.nk * (CAST(t.s AS DOUBLE)/t.n) * (CAST(t.s AS DOUBLE)/t.n))
        |    / (CAST(t.sxx AS DOUBLE) - t.n * (CAST(t.s AS DOUBLE)/t.n) * (CAST(t.s AS DOUBLE)/t.n)),
        |    6) AS acf
        |FROM pl p JOIN tot t USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM daily),
        |tot AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS sxx
        |  FROM idx GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type, k.lag, a.x, b.x AS xl
        |  FROM idx a JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) k(lag) ON true
        |  JOIN idx b ON b.event_type = a.event_type AND b.rn = a.rn - k.lag),
        |pl AS (SELECT event_type, lag, COUNT(*) AS nk, SUM(x*xl) AS sxy,
        |  SUM(x) AS sh, SUM(xl) AS st FROM pairs GROUP BY 1, 2),
        |rk AS (
        |  SELECT p.event_type, t.n,
        |    round((CAST(p.sxy AS DOUBLE)
        |        - (CAST(t.s AS DOUBLE)/t.n) * CAST(p.sh + p.st AS DOUBLE)
        |        + p.nk * (CAST(t.s AS DOUBLE)/t.n) * (CAST(t.s AS DOUBLE)/t.n))
        |      / (CAST(t.sxx AS DOUBLE) - t.n * (CAST(t.s AS DOUBLE)/t.n) * (CAST(t.s AS DOUBLE)/t.n)),
        |      6) AS r, p.lag
        |  FROM pl p JOIN tot t USING (event_type)),
        |qt AS (SELECT event_type, n,
        |  CAST(floor(r * r / (n - lag) * 1e12) AS BIGINT) AS qterm FROM rk)
        |SELECT event_type, MAX(n) AS n_days,
        |  round(CAST(MAX(n) * (MAX(n) + 2) AS DOUBLE)
        |    * (CAST(SUM(qterm) AS DOUBLE) / 1e12), 6) AS q_stat,
        |  round(CAST(MAX(n) * (MAX(n) + 2) AS DOUBLE)
        |    * (CAST(SUM(qterm) AS DOUBLE) / 1e12), 6) > 14.067140 AS whiteness_rejected
        |FROM qt GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |  CAST(day - DATE '1970-01-01' AS INT) AS dk FROM daily),
        |pairs AS (
        |  SELECT a.event_type, a.rn AS i, b.rn AS j,
        |    CAST(b.x - a.x AS DOUBLE) / CAST(b.dk - a.dk AS DOUBLE) AS slope
        |  FROM idx a JOIN idx b ON b.event_type = a.event_type AND a.rn < b.rn),
        |m AS (SELECT event_type, COUNT(*) AS n_pairs FROM pairs GROUP BY 1),
        |rkd AS (SELECT p.*, row_number() OVER (PARTITION BY event_type
        |  ORDER BY slope, i, j) AS rk FROM pairs p)
        |SELECT r.event_type, m.n_pairs, round(r.slope, 6) AS ts_slope
        |FROM rkd r JOIN m USING (event_type)
        |WHERE r.rk = (m.n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM daily),
        |sp AS (
        |  SELECT a.event_type,
        |    CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT) AS s_stat
        |  FROM idx a JOIN idx b ON b.event_type = a.event_type AND a.rn < b.rn
        |  GROUP BY 1),
        |tg AS (SELECT event_type, x, COUNT(*) AS tc FROM idx GROUP BY 1, 2),
        |tt AS (SELECT event_type,
        |  CAST(SUM(tc*(tc-1)*(2*tc+5)) AS BIGINT) AS tie_term,
        |  CAST(SUM(tc) AS BIGINT) AS n FROM tg GROUP BY 1)
        |SELECT s.event_type, t.n AS n_days, s.s_stat,
        |  t.n*(t.n-1)*(2*t.n+5) - t.tie_term AS var18,
        |  round(CASE
        |    WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
        |      / sqrt(CAST(t.n*(t.n-1)*(2*t.n+5) - t.tie_term AS DOUBLE) / 18)
        |    WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
        |      / sqrt(CAST(t.n*(t.n-1)*(2*t.n+5) - t.tie_term AS DOUBLE) / 18)
        |    ELSE 0.0 END, 6) AS z,
        |  CASE WHEN s.s_stat > 0 THEN 'increasing'
        |       WHEN s.s_stat < 0 THEN 'decreasing'
        |       ELSE 'none' END AS direction
        |FROM sp s JOIN tt t USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS x
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, day, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |  SUM(x) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM daily),
        |tot AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s FROM idx GROUP BY 1),
        |scored AS (
        |  SELECT i.event_type, i.day, i.rn, i.p, t.n, t.s,
        |    (CAST(i.p AS DOUBLE) * t.n - CAST(t.s AS DOUBLE) * i.rn)
        |      * (CAST(i.p AS DOUBLE) * t.n - CAST(t.s AS DOUBLE) * i.rn)
        |      / CAST(i.rn * (t.n - i.rn) AS DOUBLE) AS score
        |  FROM idx i JOIN tot t USING (event_type)
        |  WHERE i.rn < t.n),
        |best AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY score DESC, rn) AS rk FROM scored)
        |SELECT event_type, n AS n_days, day AS split_day,
        |  CAST(rn AS INT) AS split_idx, round(score, 4) AS score,
        |  round(CAST(p AS DOUBLE) / rn, 6) AS mean_left,
        |  round(CAST(s - p AS DOUBLE) / (n - rn), 6) AS mean_right
        |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_ewma" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, CAST(value AS DOUBLE) AS x,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 40),
        |s AS (
        |  SELECT user_id, rn, x, x AS ewma FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.x,
        |    CAST(0.25 AS DOUBLE)*o.x + CAST(0.75 AS DOUBLE)*s.ewma
        |  FROM o JOIN s ON o.user_id = s.user_id AND o.rn = s.rn + 1)
        |SELECT user_id, rn, x, ewma FROM s ORDER BY user_id, rn""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, CAST(value AS DOUBLE) AS x,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 40),
        |s AS (
        |  SELECT user_id, rn, x, x AS level, CAST(0 AS DOUBLE) AS trend
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT user_id, rn, x, nl,
        |    CAST(0.25 AS DOUBLE)*(nl - l0) + CAST(0.75 AS DOUBLE)*b0
        |  FROM (SELECT o.user_id, o.rn, o.x,
        |          CAST(0.5 AS DOUBLE)*o.x
        |            + CAST(0.5 AS DOUBLE)*(s.level + s.trend) AS nl,
        |          s.level AS l0, s.trend AS b0
        |        FROM o JOIN s ON o.user_id = s.user_id AND o.rn = s.rn + 1) q)
        |SELECT user_id, rn, x, level, trend FROM s
        |ORDER BY user_id, rn""".stripMargin,
    "q_holt_winters" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, CAST(value AS DOUBLE) AS x,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 25),
        |s AS (
        |  SELECT user_id, rn, x, x AS level, CAST(0 AS DOUBLE) AS trend,
        |    CAST(0.25 AS DOUBLE)*(x - x) + CAST(0.75 AS DOUBLE)*CAST(0 AS DOUBLE)
        |      AS season,
        |    [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0,
        |     CAST(0.25 AS DOUBLE)*(x - x) + CAST(0.75 AS DOUBLE)*CAST(0 AS DOUBLE)]
        |      AS seas
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT user_id, rn, x, nl,
        |    CAST(0.25 AS DOUBLE)*(nl - l0) + CAST(0.75 AS DOUBLE)*b0,
        |    CAST(0.25 AS DOUBLE)*(x - nl) + CAST(0.75 AS DOUBLE)*sm,
        |    seas0[2:7] ||
        |      [CAST(0.25 AS DOUBLE)*(x - nl) + CAST(0.75 AS DOUBLE)*sm]
        |  FROM (SELECT o.user_id, o.rn, o.x,
        |          s.seas[1] AS sm, s.level AS l0, s.trend AS b0,
        |          s.seas AS seas0,
        |          CAST(0.5 AS DOUBLE)*(o.x - s.seas[1])
        |            + CAST(0.5 AS DOUBLE)*(s.level + s.trend) AS nl
        |        FROM o JOIN s ON o.user_id = s.user_id AND o.rn = s.rn + 1) q)
        |SELECT user_id, rn, x, level, trend, season FROM s
        |ORDER BY user_id, rn""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, CAST(value AS DOUBLE) AS x,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS rn
        |  FROM events WHERE user_id < 40),
        |s AS (
        |  SELECT user_id, rn, x,
        |    greatest(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE) + (x - 50.0 - 1.5)) AS sp,
        |    least(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE) + (x - 50.0 + 1.5)) AS sn
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.x,
        |    greatest(CAST(0 AS DOUBLE), s.sp + (o.x - 50.0 - 1.5)),
        |    least(CAST(0 AS DOUBLE), s.sn + (o.x - 50.0 + 1.5))
        |  FROM o JOIN s ON o.user_id = s.user_id AND o.rn = s.rn + 1)
        |SELECT user_id, rn, x, sp, sn, (sp > 100.0 OR sn < -100.0) AS alarm
        |FROM s ORDER BY user_id, rn""".stripMargin,
    "q_walkforward" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |b AS (SELECT quantile_disc(t, 0.25) AS b1, quantile_disc(t, 0.5) AS b2,
        |             quantile_disc(t, 0.75) AS b3 FROM e),
        |q AS (SELECT e.*, 1 + CAST(t > b1 AS INT) + CAST(t > b2 AS INT)
        |        + CAST(t > b3 AS INT) AS qt
        |      FROM e CROSS JOIN b),
        |f AS (SELECT q.*, fold FROM q
        |      CROSS JOIN (SELECT unnest([1, 2, 3]) AS fold) folds),
        |r AS (SELECT CAST(fold AS INT) AS fold,
        |        CASE WHEN qt <= fold THEN 'train'
        |             WHEN qt = fold + 1 THEN 'test' END AS role,
        |        user_id, t
        |      FROM f)
        |SELECT fold, role, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(min(t) AS BIGINT) AS min_t, CAST(max(t) AS BIGINT) AS max_t
        |FROM r WHERE role IS NOT NULL
        |GROUP BY fold, role ORDER BY fold, role""".stripMargin,
    "q_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,2))) AS v_dec
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT event_type, day, CAST(v_dec AS DOUBLE) AS v,
        |    CAST(sum(v_dec) OVER w AS DOUBLE) / 7 AS trend,
        |    count(*) OVER w AS n_win,
        |    CAST(dayofweek(day) + 1 AS INT) AS dow
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |full_ AS (
        |  SELECT event_type, day, v, trend, v - trend AS det, dow
        |  FROM tr WHERE n_win = 7),
        |seas AS (
        |  SELECT event_type, dow,
        |    list_reduce(list(det ORDER BY day), (a, x) -> a + x) / count(*)
        |      AS seasonal
        |  FROM full_ GROUP BY 1, 2)
        |SELECT f.event_type, f.day, round(f.v, 6) AS v,
        |  round(f.trend, 6) AS trend, round(s.seasonal, 6) AS seasonal,
        |  round(f.det - s.seasonal, 6) AS residual
        |FROM full_ f JOIN seas s USING (event_type, dow)
        |ORDER BY f.event_type, f.day""".stripMargin,
    "q_resample_locf" ->
      """WITH obs AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |      FROM obs GROUP BY 1),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |j AS (SELECT g.user_id, g.day, o.n
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.day = o.day)
        |SELECT user_id, day,
        |  last_value(n IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
        |FROM j ORDER BY user_id, day""".stripMargin,
    "q_resample_ohlc" ->
      s"""WITH e AS (SELECT event_type,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk,
        |    CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        |w AS (SELECT event_type, wk, value,
        |  first_value(value) OVER (PARTITION BY event_type, wk
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS op,
        |  last_value(value) OVER (PARTITION BY event_type, wk
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cl
        |  FROM e)
        |SELECT event_type, wk, min(op) AS open, max(value) AS high,
        |  min(value) AS low, min(cl) AS close,
        |  CAST(count(*) AS BIGINT) AS n, ${oSumDec("value")} AS total
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_resample_interp" ->
      s"""WITH obs AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         ${oSumDec("value")} AS v
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |      FROM obs GROUP BY 1),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |j AS (SELECT g.user_id, g.day, o.v,
        |        g.day - DATE '2024-01-01' AS pos
        |      FROM grid g LEFT JOIN obs o
        |        ON g.user_id = o.user_id AND g.day = o.day),
        |w AS (SELECT user_id, day, v, pos,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
        |  last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |  first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pn
        |  FROM j)
        |SELECT user_id, day,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN vn IS NULL THEN vp
        |       WHEN vp IS NULL THEN vn
        |       ELSE vp + (vn - vp) *
        |         (CAST(pos - pp AS DOUBLE) / CAST(pn - pp AS DOUBLE)) END AS v
        |FROM w ORDER BY user_id, day""".stripMargin
  )
}
