package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join over the events stream: each click matched to the most
  * recent purchase by the same user at or before the click. Oracle =
  * DuckDB's native ASOF LEFT JOIN — an independent implementation of
  * the same semantics, so a hash match validates the union+carry
  * formulation end to end (ties at equal ts included, no-match rows
  * null). */
object AsOfQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      // dedup same-(user, ts) purchases deterministically (keep max id)
      // so both engines face an unambiguous as-of target
      val rn = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("p_id").desc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"), col("value").as("p_value"))
        .withColumn("_rn", row_number().over(rn)).filter(col("_rn") === 1).drop("_rn")
      AsOfJoin.backward(clicks, purchases, "user_id", "ts")
        .select(col("user_id"), col("click_id"),
          col("_asof.p_id").as("p_id"), col("_asof.p_value").as("p_value"),
          // UTC session: LTZ→NTZ is value-preserving; oracle TIMESTAMP is naive
          col("_asof_ts").cast("timestamp_ntz").as("p_ts"))
        .orderBy(col("user_id"), col("click_id"))
    }),
    "q_asof_forward" -> ((s, dir) => {
      // Forward as-of: each click matched to the NEXT purchase at or
      // after it — the label-lookahead join of outcome attribution.
      // Oracle = DuckDB ASOF with the inequality reversed.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val rn = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("p_id").desc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"), col("value").as("p_value"))
        .withColumn("_rn", row_number().over(rn)).filter(col("_rn") === 1).drop("_rn")
      AsOfJoin.forward(clicks, purchases, "user_id", "ts")
        .select(col("user_id"), col("click_id"),
          col("_asof.p_id").as("p_id"), col("_asof.p_value").as("p_value"),
          col("_asof_ts").cast("timestamp_ntz").as("p_ts"))
        .orderBy(col("user_id"), col("click_id"))
    }),
    "q_asof_nearest" -> ((s, dir) => {
      // Nearest as-of (pandas merge_asof direction='nearest'): closer
      // of the backward/forward candidates, backward on exact-distance
      // ties. One shuffle, two in-partition sorts — never two joins.
      // Oracle = two DuckDB ASOF joins + the same tie-breaking CASE,
      // an independent formulation of the distance rule.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val rn = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("p_id").desc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"), col("value").as("p_value"))
        .withColumn("_rn", row_number().over(rn)).filter(col("_rn") === 1).drop("_rn")
      AsOfJoin.nearest(clicks, purchases, "user_id", "ts")
        .select(col("user_id"), col("click_id"),
          col("_asof.p_id").as("p_id"), col("_asof.p_value").as("p_value"),
          col("_asof_ts").cast("timestamp_ntz").as("p_ts"))
        .orderBy(col("user_id"), col("click_id"))
    }),
    "q_sessionize" -> ((s, dir) => {
      // BATCH sessionization — the gaps-and-islands op (conversation /
      // browsing-session assembly for a training pipeline) declared as
      // one session_window aggregate: events of a user merge while the
      // gap to the previous event is < 30 min. Scale shape: one
      // shuffle on user_id, sessions assembled inside the aggregate —
      // never a self-join. The oracle is an INDEPENDENT formulation
      // (lag + running-sum island numbering), so the hash match pins
      // the boundary rule (gap == 30 min starts a NEW session) exactly.
      val ev = t(s, dir, "events")
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("timestamp_ntz").as("first_ts"),
          col("session_window.end").cast("timestamp_ntz").as("sess_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("first_ts"))
    }),
    "q_window_hopping" -> ((s, dir) => {
      // hopping (sliding) time windows: 1-hour windows every 30 min,
      // each event lands in size/slide = 2 windows — the batch analog
      // of the streaming hopping aggregate, declared with the same
      // window() Spark uses under watermarks. Oracle replays the
      // window assignment as pure timestamp arithmetic (trunc + half-
      // hour offset, then both covering starts unnested). Exact sums
      // via the DECIMAL(18,2) pattern. Scale: one partial-aggregable
      // rollup at 2× the event count — no self-join, no calendar table.
      val ev = t(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumDec(col("value")).as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("wstart"),
          col("window.end").cast("timestamp_ntz").as("wend"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type"))
    }),
    "q_drift_monitor" -> ((s, dir) => {
      // Ingest-drift monitor — the freshness/anomaly audit of a
      // continuously-fed corpus: per (event_type, day), today's count
      // vs the trailing 7-day window, spike = count > 2× trailing
      // mean, expressed as INTEGER cross-multiplication
      // (n·k > 2·Σ) so the flag is engine-exact — no float mean, no
      // stddev associativity. One partial-aggregable daily rollup +
      // a bounded per-type window; scale cost is the rollup shuffle.
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("trail_n", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("trail_k", count(col("n")).over(w))
        .withColumn("spike",
          col("trail_k") >= 3 && col("n") * col("trail_k") > col("trail_n") * 2)
        .orderBy(col("event_type"), col("day"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS p_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT c.user_id, c.click_id, p.p_id, p.p_value, p.ts AS p_ts
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, c.click_id""".stripMargin,
    "q_asof_forward" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS p_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
        |SELECT c.user_id, c.click_id, p.p_id, p.p_value, p.ts AS p_ts
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.user_id, c.click_id""".stripMargin,
    "q_asof_nearest" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS p_id, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |b AS (
        |  SELECT c.user_id, c.click_id, c.ts, p.p_id, p.p_value, p.ts AS p_ts
        |  FROM clicks c ASOF LEFT JOIN purchases p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts),
        |f AS (
        |  SELECT c.user_id, c.click_id, c.ts, p.p_id, p.p_value, p.ts AS p_ts
        |  FROM clicks c ASOF LEFT JOIN purchases p
        |    ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT b.user_id, b.click_id,
        |  CASE WHEN b.p_ts IS NULL THEN f.p_id
        |       WHEN f.p_ts IS NULL THEN b.p_id
        |       WHEN b.ts - b.p_ts <= f.p_ts - f.ts THEN b.p_id ELSE f.p_id END AS p_id,
        |  CASE WHEN b.p_ts IS NULL THEN f.p_value
        |       WHEN f.p_ts IS NULL THEN b.p_value
        |       WHEN b.ts - b.p_ts <= f.p_ts - f.ts THEN b.p_value ELSE f.p_value END AS p_value,
        |  CASE WHEN b.p_ts IS NULL THEN f.p_ts
        |       WHEN f.p_ts IS NULL THEN b.p_ts
        |       WHEN b.ts - b.p_ts <= f.p_ts - f.ts THEN b.p_ts ELSE f.p_ts END AS p_ts
        |FROM b JOIN f ON b.click_id = f.click_id
        |ORDER BY b.user_id, b.click_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              + INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |g AS (SELECT user_id, ts,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, MIN(ts) AS first_ts,
        |  MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, first_ts""".stripMargin,
    "q_window_hopping" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |b AS (SELECT event_type, value,
        |    date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
        |      THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS b0
        |  FROM e),
        |x AS (SELECT event_type, value,
        |    unnest([b0 - INTERVAL 30 MINUTE, b0]) AS wstart FROM b)
        |SELECT wstart, wstart + INTERVAL 1 HOUR AS wend, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin,
    "q_drift_monitor" ->
      """WITH d AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day, n,
        |    CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS trail_n,
        |    CAST(count(n) OVER w AS BIGINT) AS trail_k
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n, trail_n, trail_k,
        |  (trail_k >= 3 AND n * trail_k > trail_n * 2) AS spike
        |FROM t ORDER BY event_type, day""".stripMargin
  )
}
