package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{IntervalJoin, RangeJoin}

/** Range-join query: clicks landing inside a ±5-minute window around
  * each purchase by the same user. The Spark side runs the bucketed
  * RangeJoin operator (equi-join on (user, bucket) + residual);
  * the oracle spells the same semantics as a raw inequality join —
  * a hash match proves the bucketing loses and duplicates nothing. */
object RangeQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          (col("ts") - expr("INTERVAL 5 MINUTE")).as("w_start"),
          (col("ts") + expr("INTERVAL 5 MINUTE")).as("w_end"))
      RangeJoin.pointInInterval(clicks, windows,
          key = "user_id", ts = "ts", start = "w_start", end = "w_end",
          bucketSeconds = 600)
        .groupBy(col("user_id"), col("p_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
        .orderBy(col("user_id"), col("p_id"))
    }),
    "q_interval_join" -> ((s, dir) => {
      // interval-OVERLAP self join: per-user activity spans
      // [ts, ts + (event_id%7+1) min]; pairs of overlapping spans.
      // Oracle is the raw inequality join — hash match proves the
      // bucketed plan loses and duplicates nothing.
      val iv = t(s, dir, "events").filter(col("event_id") < 3000)
        .select(col("event_id"), col("user_id"), col("ts").as("s"),
          expr("timestampadd(MINUTE, cast(event_id % 7 + 1 AS INT), ts)").as("e"))
      IntervalJoin.overlap(iv, iv, key = "user_id", start = "s", end = "e",
          bucketSeconds = 240)
        .where(col("l_event_id") < col("r_event_id"))
        .select(col("l_event_id"), col("r_event_id"),
          col("l_user_id").as("user_id"),
          (unix_timestamp(least(col("l_e"), col("r_e"))) -
            unix_timestamp(greatest(col("l_s"), col("r_s")))).as("overlap_s"))
        .orderBy(col("l_event_id"), col("r_event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_range_join" ->
      """WITH clicks AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |windows AS (
        |  SELECT user_id, event_id AS p_id,
        |         CAST(ts AS TIMESTAMP) - INTERVAL 5 MINUTE AS w_start,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS w_end
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, w.p_id, COUNT(*) AS n_clicks, MIN(c.click_id) AS first_click
        |FROM clicks c JOIN windows w
        |  ON c.user_id = w.user_id AND c.ts >= w.w_start AND c.ts < w.w_end
        |GROUP BY c.user_id, w.p_id
        |ORDER BY c.user_id, w.p_id""".stripMargin,
    "q_interval_join" ->
      """WITH iv AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS s,
        |    CAST(ts AS TIMESTAMP) + ((event_id % 7 + 1) * INTERVAL 1 MINUTE) AS e
        |  FROM events WHERE event_id < 3000)
        |SELECT a.event_id AS l_event_id, b.event_id AS r_event_id,
        |  a.user_id AS user_id,
        |  CAST(floor(epoch(least(a.e, b.e))) - floor(epoch(greatest(a.s, b.s)))
        |    AS BIGINT) AS overlap_s
        |FROM iv a JOIN iv b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND a.s <= b.e AND b.s <= a.e
        |ORDER BY l_event_id, r_event_id""".stripMargin
  )
}
