package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Event-sequence analytics: ordered funnel + daily cohort retention
  * over the events table. Both oracles are independent DuckDB
  * formulations of the same semantics (staged min-ts CTE chain /
  * first-day rollup), so a hash match pins the ordering rule — a
  * stage event BEFORE the user's previous-stage first-touch must not
  * count, and the same-instant boundary is inclusive. All outputs
  * are integer counts (no float rates), keeping the compare
  * engine-exact.
  */
object EventQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_funnel" -> ((s, dir) => {
      EventAnalytics.funnel(t(s, dir, "events"),
          stages = Seq("view", "click", "purchase"))
        .orderBy(col("stage_idx"))
    }),
    "q_cohort_retention" -> ((s, dir) => {
      EventAnalytics.cohortRetention(t(s, dir, "events"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),
    "q_funnel_window" -> ((s, dir) => {
      // windowed-funnel conversion: every later stage within 1 day of
      // the user's stage-1 first touch
      EventAnalytics.funnel(t(s, dir, "events"),
          stages = Seq("view", "click", "purchase"), maxSpan = Some("1 day"))
        .orderBy(col("stage_idx"))
    }),
    "q_event_paths" -> ((s, dir) => {
      EventAnalytics.topEventPaths(t(s, dir, "events"), k = 10)
    }),
    "q_event_transitions" -> ((s, dir) => {
      // first-order Markov transition matrix: integer bigram counts +
      // one exact-integer-ratio float per row on the 1e-6 grid
      EventAnalytics.transitionMatrix(t(s, dir, "events"))
        .orderBy(col("from_type"), col("to_type"))
    }),
    "q_event_islands" -> ((s, dir) => {
      // gaps-and-islands: per-user runs of consecutive active days via
      // the classic day-minus-row_number group key — all-integer
      // arithmetic, one user-keyed shuffle, no self-join
      import org.apache.spark.sql.expressions.Window
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val rn = row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("day")))
      days
        .withColumn("_grp",
          datediff(col("day"), to_date(lit("2024-01-01"))) - rn)
        .groupBy(col("user_id"), col("_grp"))
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          count(lit(1)).as("n_days"))
        .select(col("user_id"), col("start_day"), col("end_day"), col("n_days"))
        .orderBy(col("user_id"), col("start_day"))
    }),
    "q_rfm" -> ((s, dir) => {
      // RFM segmentation: per-user recency/frequency/monetary rollup +
      // global quintile scores. Scores come from broadcast quantile
      // THRESHOLDS — one percentile_disc aggregate row over the user
      // rollup, then score = 1 + #(cut points passed) — NOT an ntile
      // over the |users|-sized frame (the r12 ccnet finding: a global
      // window there single-partition-sorts every user at 1e9-user
      // scale; thresholds are one row out + a broadcast compare, and
      // metric TIES now share a score by construction). frequency/
      // monetary are negated so all three use the same ascending
      // percentile definition (k-th LARGEST = -(k-th smallest of -v)),
      // which DuckDB's quantile_disc replays value-for-value.
      val ref = to_date(lit("2024-02-01"))
      val base = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(datediff(ref, max(to_date(col("ts")))).as("recency_days"),
          count(lit(1)).as("frequency"),
          sumDec(col("value")).as("monetary"))
      def cuts(v: String, pfx: String) = (1 to 4).map(k =>
        expr(s"percentile_disc(CAST(0.${2 * k} AS DOUBLE)) " +
            s"WITHIN GROUP (ORDER BY $v)")
          .as(s"$pfx$k"))
      val allCuts = cuts("recency_days", "r") ++ cuts("-frequency", "f") ++
        cuts("-monetary", "m")
      val th = base.agg(allCuts.head, allCuts.tail: _*)
      def score(v: org.apache.spark.sql.Column, pfx: String) =
        (lit(1) + (1 to 4).map(k => (v > col(s"$pfx$k")).cast("int"))
          .reduce(_ + _)).as(s"${pfx}_score")
      base.crossJoin(broadcast(th))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"),
          score(col("recency_days"), "r"),
          score(-col("frequency"), "f"),
          score(-col("monetary"), "m"))
        .orderBy(col("user_id"))
    }),
    "q_twap" -> ((s, dir) => {
      // Time-weighted average value per (user, day): each observation
      // weighted by the exact microseconds until the next observation
      // that day (the last one carries no weight — the TWAP
      // convention for a closed window). Numerator is an exact
      // decimal·int64 sum, so the final double division is
      // bit-identical cross-engine. One shuffle (user, day).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
          col("event_id"), col("value"))
        .withColumn("_dt",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .filter(col("_dt").isNotNull)
        .groupBy(col("user_id"), col("day"))
        .agg((d(sum(dec(col("value")) * col("_dt"))) / d(sum(col("_dt"))))
            .as("twap"),
          (count(lit(1)) + 1).as("n_events"))
        .orderBy(col("user_id"), col("day"))
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD Type-2 dimension history from the raw event log: per-user
      // event_type "state" versions with [valid_from, valid_to)
      // intervals, no-op repeats suppressed, open version flagged
      // current. One shuffle (both windows share the partitioning).
      val log = t(s, dir, "events").filter(col("user_id") < 60)
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("event_id"), col("event_type"))
      graft.operators.Scd2.build(log, key = Seq("user_id"), ts = "ts",
          attrs = Seq("event_type"), tiebreak = Seq("event_id"))
        .orderBy(col("user_id"), col("valid_from"))
    }),
    "q_dim_lookup" -> ((s, dir) => {
      // Point-in-time dimension lookup — the composition proof for
      // Scd2 + AsOfJoin: purchases build a per-user value-band
      // dimension history, then every click fact reads the band
      // valid AT ITS TIMESTAMP via the backward as-of join. DuckDB's
      // NATIVE ASOF JOIN over the replayed version table is the
      // oracle — two independent temporal-join implementations must
      // agree row for row.
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").filter(col("user_id") < 60)
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("event_id"), col("event_type"), col("value"))
      val rn = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val bandLog = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") / 100).cast("int").as("band"))
        .withColumn("_rn", row_number().over(rn)).filter(col("_rn") === 1)
        .drop("_rn")
      val versions = graft.operators.Scd2.build(bandLog, Seq("user_id"),
          "ts", Seq("band"), Seq("event_id"))
        .select(col("user_id"), col("valid_from").as("ts"), col("band"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.operators.AsOfJoin.backward(clicks, versions, "user_id", "ts")
        .select(col("user_id"), col("click_id"),
          col("_asof.band").as("band"), col("_asof_ts").as("ver_ts"))
        .orderBy(col("user_id"), col("click_id"))
    }),
    "q_attribution" -> ((s, dir) => {
      // Batch multi-touch attribution: every purchase credits the
      // clicks in its trailing 1-day window under three models —
      // first-touch, last-touch, linear. Credits are INTEGER ppm
      // (floor(1e6/n) for linear) so the per-channel sums are exact;
      // channel derives from the click's props payload. The join is
      // user-keyed with a bounded time band.
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"), col("event_id"),
          (get_json_object(col("props"), "$.k").cast("long") % 3)
            .as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("t").as("pt"), col("event_id").as("pid"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t").as("ct"),
          col("event_id").as("cid"), col("channel"))
      val touches = purchases.join(clicks, Seq("user_id"))
        .filter(col("ct") <= col("pt") &&
          col("ct") > col("pt") - lit(86400000000L))
      val w = Window.partitionBy(col("pid"))
      val ranked = touches
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rn_first", row_number().over(
          w.orderBy(col("ct"), col("cid"))))
        .withColumn("rn_last", row_number().over(
          w.orderBy(col("ct").desc, col("cid").desc)))
      ranked.groupBy(col("channel")).agg(
          sum(when(col("rn_first") === 1, 1000000L).otherwise(0L))
            .as("first_touch_ppm"),
          sum(when(col("rn_last") === 1, 1000000L).otherwise(0L))
            .as("last_touch_ppm"),
          sum(floor(lit(1000000L) / col("n"))).as("linear_ppm"),
          count(lit(1)).as("n_touches"))
        .orderBy(col("channel"))
    }),
    "q_survival_km" -> ((s, dir) => {
      // Kaplan-Meier survival over user lifetimes (days from first to
      // last activity; lifetimes ending >= 7 days before the corpus
      // horizon are churn EVENTS, later ones are CENSORED). S(t) =
      // Π(1 − d_s/n_s) folds ln-terms over a duration-SORTED array
      // per row (the distinct-duration table is tiny), so the float
      // product is order-deterministic cross-engine.
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val life = ud.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          datediff(col("d1"), col("d0")).cast("int").as("dur"),
          (col("d1") <= to_date(lit("2024-01-23"))).cast("int").as("died"))
      val byDur = life.groupBy(col("dur")).agg(
        count(lit(1)).as("n_at"), sum(col("died")).as("d_at"))
      // risk set = users with duration >= t (inclusive); terms for
      // every distinct duration, folded in dur order up to each row
      val withRisk = byDur
        .withColumn("all_", expr("collect_list(struct(dur, n_at, d_at)) over ()"))
        .withColumn("n_risk", expr(
          "aggregate(filter(all_, x -> x.dur >= dur), 0L, (a, x) -> a + x.n_at)"))
        // ln(greatest(term, 1e-300)): an all-deaths tail would be
        // ln(0) — the floor keeps both engines finite and rounds to
        // the same 0.0 survival
        .withColumn("surv", expr(
          "round(exp(aggregate(array_sort(filter(all_, x -> x.dur <= dur)), " +
          "cast(0 as double), (a, x) -> a + ln(greatest(1 - x.d_at / " +
          "aggregate(filter(all_, y -> y.dur >= x.dur), 0L, (a2, y) -> a2 + y.n_at)" +
          ", 1e-300)))), 6)"))
      withRisk.select(col("dur"), col("n_at"), col("d_at"),
          col("n_risk"), col("surv"))
        .orderBy(col("dur"))
    }),
    "q_growth_accounting" -> ((s, dir) => {
      // Growth accounting: each (user, active-day) classified
      // new / retained / resurrected from the user's previous active
      // day, plus churned = active the day before but gone today —
      // all integer counts from one lag/lead pass over the distinct
      // (user, day) activity table (one shuffle by user).
      import org.apache.spark.sql.expressions.Window
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val lagged = ud.withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("next_", lead(col("day"), 1).over(w))
      val classed = lagged.groupBy(col("day")).agg(
        sum(when(col("prev").isNull, 1).otherwise(0)).as("n_new"),
        sum(when(datediff(col("day"), col("prev")) === 1, 1).otherwise(0))
          .as("n_retained"),
        sum(when(col("prev").isNotNull &&
          datediff(col("day"), col("prev")) > 1, 1).otherwise(0))
          .as("n_resurrected"))
      val churned = lagged
        .filter(col("next_").isNull || datediff(col("next_"), col("day")) > 1)
        .select(date_add(col("day"), 1).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
      classed.join(churned, Seq("day"), "left")
        .na.fill(0, Seq("n_churned"))
        .orderBy(col("day"))
    }),
    "q_stickiness" -> ((s, dir) => {
      // DAU / trailing-7-day WAU stickiness: exact distinct actives
      // per sliding week via a bounded day-grid range join (the day
      // table is calendar-sized — broadcast; the activity table is
      // scanned once per side). Ratio is one double division.
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select(col("day").as("d")).distinct()
      val dau = ud.groupBy(col("day").as("d"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = broadcast(days).join(ud,
          datediff(col("d"), col("day")).between(0, 6))
        .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "d")
        .select(col("d").as("day"), col("dau"), col("wau"),
          round(col("dau") / col("wau"), 6).as("stickiness"))
        .orderBy(col("day"))
    }),
    "q_ratio_report" -> ((s, dir) => {
      // RATIO_TO_REPORT analog (Oracle's analytic; MySQL spells it as
      // a windowed division): each (event_type, dow) cell's share of
      // its type and of the grand total — integer counts, two window
      // sums, one double division each.
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "events")
        .groupBy(col("event_type"), dayofweek(col("ts")).cast("int").as("dow"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("of_type", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("event_type"))), 6))
        .withColumn("of_total", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()), 6))
        .orderBy(col("event_type"), col("dow"))
    }),
    "q_anomaly_days" -> ((s, dir) => {
      // Robust anomaly screen over daily totals: |day − median| > 3·MAD
      // flags the day. Median and MAD via percentile_disc (discrete —
      // engine-identical by the SQL-standard smallest-cume rule);
      // totals exact decimal, the deviation one double chain. The
      // 1-row robust-stats frame broadcasts back over the day table.
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sumDec(col("value")).as("total"))
      val med = daily.agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY total)").as("med"))
      val withDev = daily.crossJoin(broadcast(med))
        .withColumn("absdev", abs(col("total") - col("med")))
      val mad = withDev.agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY absdev)").as("mad"))
      withDev.crossJoin(broadcast(mad))
        .select(col("day"), col("total"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
          (col("absdev") > lit(3) * col("mad")).as("anomaly"))
        .orderBy(col("day"))
    }),
    "q_max_concurrency" -> ((s, dir) => {
      // Peak concurrent activity per day: each user's daily activity
      // span becomes +1/−1 boundary events; a running sum over the
      // (time, delta, user) total order gives instantaneous
      // concurrency, max'd per day — the classic interval-overlap
      // counting shape, all integers, one shuffle by day.
      import org.apache.spark.sql.expressions.Window
      val spans = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      // end boundaries sort BEFORE starts at the same instant via
      // delta asc (-1 < +1): a span ending exactly when another
      // starts does not overlap it
      val bounds = spans.select(col("day"), col("t0").as("t"),
          lit(1).as("delta"), col("user_id"))
        .unionByName(spans.select(col("day"), col("t1").as("t"),
          lit(-1).as("delta"), col("user_id")))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("t"), col("delta"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn("conc", sum(col("delta")).over(w))
        .groupBy(col("day"))
        .agg(max(col("conc")).as("peak_concurrency"),
          (count(lit(1)) / 2).cast("long").as("n_users"))
        .orderBy(col("day"))
    }),
    "q_wow_growth" -> ((s, dir) => {
      // Week-over-week growth per event type: exact decimal weekly
      // totals, lag, and one double division per row (NULL on a
      // zero/missing base week).
      import org.apache.spark.sql.expressions.Window
      val weekly = t(s, dir, "events")
        .groupBy(col("event_type"),
          weekofyear(col("ts")).cast("int").as("wk"))
        .agg(sum(dec(col("value"))).as("tot_dec"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      weekly
        .withColumn("prev_dec", lag(col("tot_dec"), 1).over(w))
        .withColumn("wow_pct", when(col("prev_dec") > 0,
          round((d(col("tot_dec")) - d(col("prev_dec"))) / d(col("prev_dec"))
            * 100, 6)))
        .select(col("event_type"), col("wk"), d(col("tot_dec")).as("total"),
          col("n"), col("wow_pct"))
        .orderBy(col("event_type"), col("wk"))
    }),
    "q_chi2_independence" -> ((s, dir) => {
      // Chi-square independence screen for event_type × day-of-week:
      // observed integer counts, expected = row_tot·col_tot/N (exact
      // int64 product, one double division), per-cell contribution —
      // no cross-cell float sum, so every value is deterministic.
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "events")
        .groupBy(col("event_type"), dayofweek(col("ts")).cast("int").as("dow"))
        .agg(count(lit(1)).as("obs"))
      val wr = Window.partitionBy(col("event_type"))
      val wc = Window.partitionBy(col("dow"))
      val wt = Window.partitionBy()
      cells
        .withColumn("row_tot", sum(col("obs")).over(wr))
        .withColumn("col_tot", sum(col("obs")).over(wc))
        .withColumn("n", sum(col("obs")).over(wt))
        .withColumn("expected",
          round((col("row_tot") * col("col_tot")).cast("double") / col("n"), 6))
        .withColumn("chi2_part", round(
          pow(col("obs") - (col("row_tot") * col("col_tot")).cast("double")
            / col("n"), 2) /
          ((col("row_tot") * col("col_tot")).cast("double") / col("n")), 6))
        .select(col("event_type"), col("dow"), col("obs"),
          col("expected"), col("chi2_part"))
        .orderBy(col("event_type"), col("dow"))
    }),
    "q_segment_entropy" -> ((s, dir) => {
      // Behavioral-mix profile per user segment: Shannon entropy and
      // Gini impurity of the event-type distribution — both folded
      // over type-SORTED arrays so the float totals are
      // order-deterministic cross-engine.
      val seg = t(s, dir, "events")
        .groupBy((col("user_id") % 4).cast("int").as("segment"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      val withTot = seg.groupBy(col("segment"))
        .agg(sum(col("c")).as("n"),
          expr("collect_list(struct(event_type, c))").as("parts"))
      withTot.select(col("segment"), col("n"),
          round(expr(
            "aggregate(array_sort(parts), cast(0 as double), " +
            "(a, x) -> a - (x.c / cast(n as double)) * " +
            "ln(x.c / cast(n as double)))"), 6).as("entropy"),
          round(expr(
            "1 - aggregate(array_sort(parts), cast(0 as double), " +
            "(a, x) -> a + (x.c / cast(n as double)) * " +
            "(x.c / cast(n as double)))"), 6).as("gini"))
        .orderBy(col("segment"))
    }),
    "q_moving_corr" -> ((s, dir) => {
      // Rolling 7-day correlation between click and purchase daily
      // totals: Σx, Σy, Σx², Σy², Σxy all carried as exact DECIMAL
      // through the window frames; the corr formula is one chain of
      // double ops per row. Full windows only; zero-variance windows
      // yield NULL.
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "click", dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("x"),
          sum(when(col("event_type") === "purchase", dec(col("value")))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      val n = count(lit(1)).over(w)
      val sx = d(sum(col("x")).over(w))
      val sy = d(sum(col("y")).over(w))
      val sxx = d(sum(col("x") * col("x")).over(w))
      val syy = d(sum(col("y") * col("y")).over(w))
      val sxy = d(sum(col("x") * col("y")).over(w))
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      daily
        .withColumn("n_win", n)
        .withColumn("corr7", when(varx > 0 && vary > 0,
          round((n * sxy - sx * sy) / sqrt(varx * vary), 6)))
        .filter(col("n_win") === 7)
        .select(col("day"), d(col("x")).as("clicks_v"),
          d(col("y")).as("purch_v"), col("corr7"))
        .orderBy(col("day"))
    }),
    "q_ab_test" -> ((s, dir) => {
      // Two-proportion z-test between experiment arms (user_id parity):
      // conversion = user made a >300-value purchase (the whole-corpus
      // any-purchase rate is 100% — degenerate). Counts are integers; the pooled
      // z-statistic is a fixed chain of double ops over them —
      // engine-deterministic, rounded at the end.
      val users = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 300, 1)
          .otherwise(0)).as("converted"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
      val arms = users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("k"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("n0"), col("k").as("k0"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("n1"), col("k").as("k1"))
      val p0 = col("k0").cast("double") / col("n0").cast("double")
      val p1 = col("k1").cast("double") / col("n1").cast("double")
      val pp = (col("k0") + col("k1")).cast("double") /
        (col("n0") + col("n1")).cast("double")
      // z is undefined when the pooled rate is degenerate (pp ∈ {0,1}
      // — all or none converted, the variance term is 0) or an arm is
      // empty: any filtered corpus slice can hit either, and ANSI
      // division would throw instead of yielding the statistician's
      // NULL. Guarded identically in the oracle.
      a.crossJoin(b).select(
        col("n0"), col("k0"), col("n1"), col("k1"),
        round(p0, 6).as("cr0"), round(p1, 6).as("cr1"),
        when(col("n0") > 0 && col("n1") > 0 && pp > 0 && pp < 1,
          round((p1 - p0) / sqrt(pp * (lit(1) - pp) *
            (lit(1.0) / col("n0").cast("double")
              + lit(1.0) / col("n1").cast("double"))), 6)).as("z"))
    }),
    "q_seq_triples" -> ((s, dir) => {
      // 3-step sequential patterns (a then b then c): supported iff
      // some b-event lies strictly between min(a-events) and
      // max(c-events) — the middle step joins EVENT rows to the two
      // extrema tables, so the blow-up is bounded by the type
      // alphabet squared, never by sequence length.
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          struct(col("ts"), col("event_id")).as("o"))
      val ut = ev.groupBy(col("user_id"), col("event_type"))
        .agg(min(col("o")).as("mn"), max(col("o")).as("mx"))
      ev.select(col("user_id"), col("event_type").as("mid_"), col("o"))
        .join(ut.select(col("user_id"), col("event_type").as("first_"),
          col("mn")), "user_id")
        .filter(col("mn") < col("o"))
        .join(ut.select(col("user_id"), col("event_type").as("third_"),
          col("mx")), "user_id")
        .filter(col("o") < col("mx"))
        .groupBy(col("first_"), col("mid_"), col("third_"))
        .agg(countDistinct(col("user_id")).as("support"))
        .filter(col("support") >= 5)
        .orderBy(col("first_"), col("mid_"), col("third_"))
    }),
    "q_seq_patterns" -> ((s, dir) => {
      // Sequential-pattern support ("a then b"): a user supports the
      // pattern iff some a-event strictly precedes some b-event ⇔
      // min(a.ts) < max(b.ts) — so the whole mining pass is one
      // (user, type) min/max rollup self-joined on user over the
      // BOUNDED type alphabet (the SPADE id-list trick relationally):
      // no per-user sequence materializes anywhere.
      val ut = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          struct(col("ts"), col("event_id")).as("o"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("o")).as("mn"), max(col("o")).as("mx"))
      ut.as("a").join(ut.as("b"), col("a.user_id") === col("b.user_id"))
        .filter(col("a.mn") < col("b.mx"))
        .groupBy(col("a.event_type").as("first_"),
          col("b.event_type").as("then_"))
        .agg(countDistinct(col("a.user_id")).as("support"))
        .orderBy(col("first_"), col("then_"))
    }),
    "q_cohort_ltv" -> ((s, dir) => {
      // Cumulative LTV curve per first-purchase cohort: revenue by
      // cohort age with an exact-DECIMAL running sum (window order
      // can't move a bit), buyers counted distinct per (cohort, age).
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      val daily = e.join(cohort, "user_id")
        .groupBy(col("c0").as("cohort_day"),
          datediff(col("day"), col("c0")).cast("int").as("age"))
        .agg(sum(dec(col("value"))).as("rev_dec"),
          countDistinct(col("user_id")).as("buyers"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_ltv", d(sum(col("rev_dec")).over(w)))
        .select(col("cohort_day"), col("age"), d(col("rev_dec")).as("revenue"),
          col("buyers"), col("cum_ltv"))
        .orderBy(col("cohort_day"), col("age"))
    }),
    "q_funnel_latency" -> ((s, dir) => {
      // Time-to-convert distribution: first purchase at/after each
      // user's first view, latency in exact integer microseconds —
      // counts + discrete percentiles are engine-exact by
      // construction (no float math anywhere).
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("vt"))
      val lat = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("t") >= col("vt"))
        .groupBy(col("user_id")).agg(min(col("t") - col("vt")).as("lat"))
      // percentile_disc returns DOUBLE in Spark even over BIGINT input;
      // the latencies are exact integer micros by construction, so the
      // cast back to LONG is lossless — and the oracle emits BIGINT
      // (r08 red row: values equal, types differed).
      lat.agg(count(lit(1)).as("n_converts"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY lat)")
          .cast("long").as("p25_us"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lat)")
          .cast("long").as("p50_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lat)")
          .cast("long").as("p90_us"),
        min(col("lat")).as("min_us"), max(col("lat")).as("max_us"))
    }),
    "q_ref_integrity" -> ((s, dir) => {
      // Referential-integrity audit across the star schema: orphaned
      // children and childless parents via anti-join counts — the
      // constraint checks a columnstore (no FK enforcement, like the
      // reference) runs as batch hygiene.
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      def cnt(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(lit(name).as("check_"), count(lit(1)).as("violations"))
      cnt("lineitem_orphans",
          li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti"))
        .unionByName(cnt("orders_childless",
          o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")))
        .unionByName(cnt("orders_badcust",
          o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")))
        .orderBy(col("check_"))
    }),
    "q_event_pattern" -> ((s, dir) => {
      // MATCH_RECOGNIZE-lite: view →(clicks/errors)*→ purchase counted
      // per user as a regex over the symbol-encoded event sequence;
      // the seq column pins the deterministic (ts, event_id) encoding
      EventAnalytics.matchPattern(t(s, dir, "events"), "v[ce]*p",
          symbols = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
            "signup" -> "s", "error" -> "e"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ratio_report" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY event_type), 6) AS of_type,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS of_total
        |FROM cells ORDER BY event_type, dow""".stripMargin,
    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM events GROUP BY 1),
        |med AS (SELECT quantile_disc(total, 0.5) AS med FROM daily),
        |dev AS (SELECT day, total, med, abs(total - med) AS absdev
        |        FROM daily CROSS JOIN med),
        |mad AS (SELECT quantile_disc(absdev, 0.5) AS mad FROM dev)
        |SELECT day, total, round(med, 6) AS med, round(mad, 6) AS mad,
        |  absdev > 3 * mad AS anomaly
        |FROM dev CROSS JOIN mad ORDER BY day""".stripMargin,
    "q_max_concurrency" ->
      """WITH spans AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT day, t0 AS t, 1 AS delta, user_id FROM spans
        |  UNION ALL
        |  SELECT day, t1 AS t, -1 AS delta, user_id FROM spans),
        |runs AS (
        |  SELECT day, sum(delta) OVER (PARTITION BY day
        |    ORDER BY t, delta, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM bounds)
        |SELECT r.day, CAST(max(r.conc) AS BIGINT) AS peak_concurrency,
        |  CAST((SELECT count(*) FROM spans s WHERE s.day = r.day)
        |    AS BIGINT) AS n_users
        |FROM runs r GROUP BY r.day ORDER BY r.day""".stripMargin,
    "q_wow_growth" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |    CAST(weekofyear(CAST(ts AS TIMESTAMP)) AS INT) AS wk,
        |    sum(CAST(value AS DECIMAL(18,2))) AS tot_dec,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, wk, tot_dec, n,
        |    lag(tot_dec) OVER (PARTITION BY event_type ORDER BY wk) AS prev_dec
        |  FROM weekly)
        |SELECT event_type, wk, CAST(tot_dec AS DOUBLE) AS total, n,
        |  CASE WHEN prev_dec > 0 THEN
        |    round((CAST(tot_dec AS DOUBLE) - CAST(prev_dec AS DOUBLE))
        |      / CAST(prev_dec AS DOUBLE) * 100, 6) END AS wow_pct
        |FROM t ORDER BY event_type, wk""".stripMargin,
    "q_chi2_independence" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
        |    count(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, dow, obs,
        |    sum(obs) OVER (PARTITION BY event_type) AS row_tot,
        |    sum(obs) OVER (PARTITION BY dow) AS col_tot,
        |    sum(obs) OVER () AS n
        |  FROM cells)
        |SELECT event_type, dow, CAST(obs AS BIGINT) AS obs,
        |  round(CAST(row_tot * col_tot AS DOUBLE) / n, 6) AS expected,
        |  round(pow(obs - CAST(row_tot * col_tot AS DOUBLE) / n, 2)
        |    / (CAST(row_tot * col_tot AS DOUBLE) / n), 6) AS chi2_part
        |FROM t ORDER BY event_type, dow""".stripMargin,
    "q_segment_entropy" ->
      """WITH seg AS (
        |  SELECT CAST(user_id % 4 AS INT) AS segment, event_type,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT segment, sum(c) AS n,
        |        list(c ORDER BY event_type) AS cs
        |      FROM seg GROUP BY segment)
        |SELECT segment, CAST(n AS BIGINT) AS n,
        |  round(list_reduce(list_transform(cs,
        |    x -> -(x / CAST(n AS DOUBLE)) * ln(x / CAST(n AS DOUBLE))),
        |    (a, x) -> a + x), 6) AS entropy,
        |  round(1 - list_reduce(list_transform(cs,
        |    x -> (x / CAST(n AS DOUBLE)) * (x / CAST(n AS DOUBLE))),
        |    (a, x) -> a + x), 6) AS gini
        |FROM g ORDER BY segment""".stripMargin,
    "q_moving_corr" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    sum(CASE WHEN event_type = 'click'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |t AS (
        |  SELECT day, CAST(x AS DOUBLE) AS xv, CAST(y AS DOUBLE) AS yv,
        |    count(*) OVER w AS n_win,
        |    CAST(sum(x) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(y) OVER w AS DOUBLE) AS sy,
        |    CAST(sum(x * x) OVER w AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) OVER w AS DOUBLE) AS syy,
        |    CAST(sum(x * y) OVER w AS DOUBLE) AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, xv AS clicks_v, yv AS purch_v,
        |  CASE WHEN n_win * sxx - sx * sx > 0 AND n_win * syy - sy * sy > 0
        |    THEN round((n_win * sxy - sx * sy)
        |      / sqrt((n_win * sxx - sx * sx) * (n_win * syy - sy * sy)), 6)
        |  END AS corr7
        |FROM t WHERE n_win = 7 ORDER BY day""".stripMargin,
    "q_ab_test" ->
      """WITH users AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 300 THEN 1 ELSE 0 END)
        |      AS converted,
        |    CAST(user_id % 2 AS INT) AS arm
        |  FROM events GROUP BY user_id),
        |arms AS (SELECT arm, count(*) AS n, sum(converted) AS k
        |         FROM users GROUP BY arm),
        |a AS (SELECT n AS n0, k AS k0 FROM arms WHERE arm = 0),
        |b AS (SELECT n AS n1, k AS k1 FROM arms WHERE arm = 1)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(k0 AS BIGINT) AS k0,
        |  CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
        |  round(k0 / n0, 6) AS cr0, round(k1 / n1, 6) AS cr1,
        |  CASE WHEN n0 > 0 AND n1 > 0
        |      AND (k0 + k1) / (n0 + n1) > 0 AND (k0 + k1) / (n0 + n1) < 1
        |    THEN round((k1 / n1 - k0 / n0)
        |      / sqrt(((k0 + k1) / (n0 + n1)) * (1 - (k0 + k1) / (n0 + n1))
        |        * (1.0 / n0 + 1.0 / n1)), 6) END AS z
        |FROM a CROSS JOIN b""".stripMargin,
    "q_seq_triples" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |ut0 AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM e),
        |ut AS (
        |  SELECT user_id, event_type,
        |    max(CASE WHEN rn_a = 1 THEN ts END) AS mn_ts,
        |    max(CASE WHEN rn_a = 1 THEN event_id END) AS mn_id,
        |    max(CASE WHEN rn_d = 1 THEN ts END) AS mx_ts,
        |    max(CASE WHEN rn_d = 1 THEN event_id END) AS mx_id
        |  FROM ut0 GROUP BY 1, 2)
        |SELECT a.event_type AS first_, m.event_type AS mid_,
        |  c.event_type AS third_,
        |  CAST(count(DISTINCT m.user_id) AS BIGINT) AS support
        |FROM e m
        |JOIN ut a ON a.user_id = m.user_id
        |  AND (a.mn_ts, a.mn_id) < (m.ts, m.event_id)
        |JOIN ut c ON c.user_id = m.user_id
        |  AND (m.ts, m.event_id) < (c.mx_ts, c.mx_id)
        |GROUP BY 1, 2, 3 HAVING count(DISTINCT m.user_id) >= 5
        |ORDER BY first_, mid_, third_""".stripMargin,
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) % 3
        |      AS channel
        |  FROM events),
        |p AS (SELECT user_id, t AS pt, event_id AS pid FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, t AS ct, event_id AS cid, channel FROM ev
        |      WHERE event_type = 'click'),
        |touch AS (
        |  SELECT p.pid, c.ct, c.cid, c.channel,
        |    count(*) OVER (PARTITION BY p.pid) AS n,
        |    row_number() OVER (PARTITION BY p.pid ORDER BY c.ct, c.cid)
        |      AS rn_first,
        |    row_number() OVER (PARTITION BY p.pid ORDER BY c.ct DESC, c.cid DESC)
        |      AS rn_last
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.ct <= p.pt AND c.ct > p.pt - 86400000000)
        |SELECT channel,
        |  CAST(sum(CASE WHEN rn_first = 1 THEN 1000000 ELSE 0 END) AS BIGINT)
        |    AS first_touch_ppm,
        |  CAST(sum(CASE WHEN rn_last = 1 THEN 1000000 ELSE 0 END) AS BIGINT)
        |    AS last_touch_ppm,
        |  CAST(sum(1000000 // n) AS BIGINT) AS linear_ppm,
        |  CAST(count(*) AS BIGINT) AS n_touches
        |FROM touch GROUP BY channel ORDER BY channel""".stripMargin,
    "q_survival_km" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |life AS (
        |  SELECT user_id, CAST(datediff('day', min(day), max(day)) AS INT)
        |      AS dur,
        |    CAST(max(day) <= DATE '2024-01-23' AS INT) AS died
        |  FROM ud GROUP BY user_id),
        |bydur AS (SELECT dur, count(*) AS n_at, sum(died) AS d_at
        |          FROM life GROUP BY dur),
        |terms AS (
        |  SELECT b.dur, b.n_at, b.d_at,
        |    (SELECT sum(x.n_at) FROM bydur x WHERE x.dur >= b.dur) AS n_risk,
        |    ln(greatest(1 - b.d_at /
        |      (SELECT sum(x.n_at) FROM bydur x WHERE x.dur >= b.dur), 1e-300))
        |      AS term
        |  FROM bydur b)
        |SELECT t.dur, CAST(t.n_at AS BIGINT) AS n_at,
        |  CAST(t.d_at AS BIGINT) AS d_at, CAST(t.n_risk AS BIGINT) AS n_risk,
        |  round(exp((SELECT list_reduce(list(s.term ORDER BY s.dur),
        |    (a, x) -> a + x) FROM terms s WHERE s.dur <= t.dur)), 6) AS surv
        |FROM terms t ORDER BY t.dur""".stripMargin,
    "q_growth_accounting" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, day,
        |    lag(day) OVER w AS prev, lead(day) OVER w AS next_
        |  FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |classed AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN datediff('day', prev, day) = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN prev IS NOT NULL
        |      AND datediff('day', prev, day) > 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM lagged GROUP BY day),
        |churned AS (
        |  SELECT day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM lagged
        |  WHERE next_ IS NULL OR datediff('day', day, next_) > 1
        |  GROUP BY day + 1)
        |SELECT c.day, c.n_new, c.n_retained, c.n_resurrected,
        |  coalesce(ch.n_churned, 0) AS n_churned
        |FROM classed c LEFT JOIN churned ch USING (day)
        |ORDER BY c.day""".stripMargin,
    "q_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |dau AS (SELECT day AS d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |        FROM ud GROUP BY 1),
        |wau AS (SELECT days.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
        |        FROM days JOIN ud
        |          ON datediff('day', ud.day, days.d) BETWEEN 0 AND 6
        |        GROUP BY days.d)
        |SELECT dau.d AS day, dau.dau, wau.wau,
        |  round(dau.dau / wau.wau, 6) AS stickiness
        |FROM dau JOIN wau USING (d) ORDER BY day""".stripMargin,
    "q_seq_patterns" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |ut0 AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM e),
        |ut AS (
        |  SELECT user_id, event_type,
        |    max(CASE WHEN rn_a = 1 THEN ts END) AS mn_ts,
        |    max(CASE WHEN rn_a = 1 THEN event_id END) AS mn_id,
        |    max(CASE WHEN rn_d = 1 THEN ts END) AS mx_ts,
        |    max(CASE WHEN rn_d = 1 THEN event_id END) AS mx_id
        |  FROM ut0 GROUP BY 1, 2)
        |SELECT a.event_type AS first_, b.event_type AS then_,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS support
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |WHERE (a.mn_ts, a.mn_id) < (b.mx_ts, b.mx_id)
        |GROUP BY 1, 2 ORDER BY first_, then_""".stripMargin,
    "q_cohort_ltv" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
        |  FROM events WHERE event_type = 'purchase'),
        |cohort AS (SELECT user_id, min(day) AS c0 FROM e GROUP BY user_id),
        |daily AS (
        |  SELECT c.c0 AS cohort_day,
        |    CAST(datediff('day', c.c0, e.day) AS INT) AS age,
        |    sum(CAST(e.value AS DECIMAL(18,2))) AS rev_dec,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS buyers
        |  FROM e JOIN cohort c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_day, age, CAST(rev_dec AS DOUBLE) AS revenue, buyers,
        |  CAST(sum(rev_dec) OVER (PARTITION BY cohort_day ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_ltv
        |FROM daily ORDER BY cohort_day, age""".stripMargin,
    "q_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |v AS (SELECT user_id, min(t) AS vt FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |lat AS (SELECT ev.user_id, min(ev.t - v.vt) AS lat
        |        FROM ev JOIN v USING (user_id)
        |        WHERE ev.event_type = 'purchase' AND ev.t >= v.vt
        |        GROUP BY ev.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_converts,
        |  CAST(quantile_disc(lat, 0.25) AS BIGINT) AS p25_us,
        |  CAST(quantile_disc(lat, 0.5) AS BIGINT) AS p50_us,
        |  CAST(quantile_disc(lat, 0.9) AS BIGINT) AS p90_us,
        |  CAST(min(lat) AS BIGINT) AS min_us,
        |  CAST(max(lat) AS BIGINT) AS max_us
        |FROM lat""".stripMargin,
    "q_ref_integrity" ->
      """SELECT 'lineitem_orphans' AS check_, CAST(count(*) AS BIGINT) AS violations
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders_childless', CAST(count(*) AS BIGINT) FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'orders_badcust', CAST(count(*) AS BIGINT) FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |ORDER BY check_""".stripMargin,
    "q_dim_lookup" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         event_type, value
        |  FROM events WHERE user_id < 60),
        |p0 AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value/100) AS INT) AS band,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM e WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, event_id, band FROM p0 WHERE rn = 1),
        |k AS (
        |  SELECT user_id, ts, event_id, band,
        |    lag(band) OVER w AS pb, lag(ts) OVER w AS pts
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT user_id, ts, band FROM k
        |      WHERE pts IS NULL OR band IS DISTINCT FROM pb),
        |c AS (SELECT user_id, ts, event_id AS click_id FROM e
        |      WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, v.band, v.ts AS ver_ts
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.user_id, c.click_id""".stripMargin,
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events WHERE user_id < 60),
        |k AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev_t, lag(ts) OVER w AS prev_ts
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |kept AS (
        |  SELECT user_id, ts, event_id, event_type FROM k
        |  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_t)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER w2 AS valid_to,
        |  lead(ts) OVER w2 IS NULL AS is_current
        |FROM kept WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from""".stripMargin,
    "q_rfm" ->
      s"""WITH base AS (
        |  SELECT user_id,
        |    datediff('day', max(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
        |             DATE '2024-02-01') AS recency_days,
        |    count(*) AS frequency,
        |    ${Q.oSumDec("value")} AS monetary
        |  FROM events GROUP BY user_id),
        |th AS (SELECT
        |  quantile_disc(recency_days, CAST(0.2 AS DOUBLE)) AS r1,
        |  quantile_disc(recency_days, CAST(0.4 AS DOUBLE)) AS r2,
        |  quantile_disc(recency_days, CAST(0.6 AS DOUBLE)) AS r3,
        |  quantile_disc(recency_days, CAST(0.8 AS DOUBLE)) AS r4,
        |  quantile_disc(-frequency, CAST(0.2 AS DOUBLE)) AS f1,
        |  quantile_disc(-frequency, CAST(0.4 AS DOUBLE)) AS f2,
        |  quantile_disc(-frequency, CAST(0.6 AS DOUBLE)) AS f3,
        |  quantile_disc(-frequency, CAST(0.8 AS DOUBLE)) AS f4,
        |  quantile_disc(-monetary, CAST(0.2 AS DOUBLE)) AS m1,
        |  quantile_disc(-monetary, CAST(0.4 AS DOUBLE)) AS m2,
        |  quantile_disc(-monetary, CAST(0.6 AS DOUBLE)) AS m3,
        |  quantile_disc(-monetary, CAST(0.8 AS DOUBLE)) AS m4
        |  FROM base)
        |SELECT user_id, CAST(recency_days AS INT) AS recency_days,
        |  frequency, monetary,
        |  CAST(1 + (recency_days > th.r1)::INT + (recency_days > th.r2)::INT
        |    + (recency_days > th.r3)::INT + (recency_days > th.r4)::INT AS INT) AS r_score,
        |  CAST(1 + (-frequency > th.f1)::INT + (-frequency > th.f2)::INT
        |    + (-frequency > th.f3)::INT + (-frequency > th.f4)::INT AS INT) AS f_score,
        |  CAST(1 + (-monetary > th.m1)::INT + (-monetary > th.m2)::INT
        |    + (-monetary > th.m3)::INT + (-monetary > th.m4)::INT AS INT) AS m_score
        |FROM base CROSS JOIN th ORDER BY user_id""".stripMargin,
    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |      ORDER BY ts, event_id) - epoch_us(CAST(ts AS TIMESTAMP)) AS dt
        |  FROM events)
        |SELECT user_id, day,
        |  CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE) AS twap,
        |  count(*) + 1 AS n_events
        |FROM e WHERE dt IS NOT NULL
        |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type AS ty FROM events),
        |s1 AS (SELECT u, min(ts) AS t FROM e WHERE ty = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.ts) AS t FROM e
        |  JOIN s1 ON e.u = s1.u AND e.ts >= s1.t
        |  WHERE e.ty = 'click' GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.ts) AS t FROM e
        |  JOIN s2 ON e.u = s2.u AND e.ts >= s2.t
        |  WHERE e.ty = 'purchase' GROUP BY e.u)
        |SELECT 1 AS stage_idx, 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        |ORDER BY stage_idx""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id AS u,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |c AS (SELECT u, min(day) AS cohort_day FROM e GROUP BY u),
        |s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM c GROUP BY cohort_day)
        |SELECT c.cohort_day,
        |  CAST(e.day - c.cohort_day AS INTEGER) AS day_offset,
        |  CAST(count(DISTINCT e.u) AS BIGINT) AS active_users,
        |  s.cohort_size
        |FROM e JOIN c USING (u) JOIN s USING (cohort_day)
        |GROUP BY c.cohort_day, day_offset, s.cohort_size
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "q_funnel_window" ->
      """WITH e AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type AS ty FROM events),
        |s1 AS (SELECT u, min(ts) AS t FROM e WHERE ty = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.ts) AS t, min(s1.t) AS t1 FROM e
        |  JOIN s1 ON e.u = s1.u AND e.ts >= s1.t
        |    AND e.ts <= s1.t + INTERVAL 1 DAY
        |  WHERE e.ty = 'click' GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.ts) AS t FROM e
        |  JOIN s2 ON e.u = s2.u AND e.ts >= s2.t
        |    AND e.ts <= s2.t1 + INTERVAL 1 DAY
        |  WHERE e.ty = 'purchase' GROUP BY e.u)
        |SELECT 1 AS stage_idx, 'view' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        |ORDER BY stage_idx""".stripMargin,
    "q_event_paths" ->
      """WITH e AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts,
        |    event_id AS eid, event_type AS ty FROM events),
        |l AS (SELECT u, ty AS step1,
        |    lead(ty, 1) OVER w AS step2, lead(ty, 2) OVER w AS step3,
        |    ts, lead(ts, 2) OVER w AS ts3
        |  FROM e WINDOW w AS (PARTITION BY u ORDER BY ts, eid))
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
        |FROM l
        |WHERE step3 IS NOT NULL AND ts3 <= ts + INTERVAL 30 MINUTE
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 10""".stripMargin,
    "q_event_transitions" ->
      """WITH e AS (SELECT user_id AS u, CAST(ts AS TIMESTAMP) AS ts,
        |    event_id AS eid, event_type AS ty FROM events),
        |pr AS (SELECT ty AS from_type,
        |    lead(ty) OVER (PARTITION BY u ORDER BY ts, eid) AS to_type FROM e),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q_event_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    (day - DATE '2024-01-01')
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |       CAST(count(*) AS BIGINT) AS n_days
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, start_day""".stripMargin,
    "q_event_pattern" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS eid,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      WHEN 'error' THEN 'e' ELSE '~' END AS ch
        |  FROM events),
        |sq AS (SELECT user_id, string_agg(ch, '' ORDER BY ts, eid) AS seq
        |       FROM e GROUP BY user_id)
        |SELECT user_id, seq,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS INT) AS n_matches
        |FROM sq ORDER BY user_id""".stripMargin
  )
}
