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
        |ORDER BY c.user_id, c.click_id""".stripMargin
  )
}
