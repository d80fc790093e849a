package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream — the funnel /
  * cohort family a warehouse engine's BI users run daily (the
  * reference serves these as plain SQL over its event-shaped tables;
  * here each is one declarative plan so Catalyst sees the whole
  * chain).
  *
  * Scale shape (both operators): every join and aggregation is keyed
  * on the user column, so the stage chain reuses ONE hash
  * partitioning end to end — AQE coalesces the later, strictly
  * smaller stages. Nothing is ever collected to the driver and no
  * operator is quadratic: funnel cost is |stages| co-partitioned
  * shuffles over a monotonically shrinking user set, cohort cost is
  * one rollup plus a broadcast-sized per-cohort size table.
  */
object EventAnalytics {

  /** Ordered funnel: how many users reach each stage IN ORDER.
    *
    * A user reaches stage k+1 if they have a stage-k+1 event at or
    * after their earliest qualifying stage-k time (the classic
    * "first-touch" funnel; `>=` makes the same-instant boundary
    * inclusive). With `maxSpan` (an interval literal, e.g. "1 day"),
    * qualifying events must also fall within that span of the user's
    * stage-1 first touch — the windowed-funnel conversion semantics
    * (both bounds inclusive). Returns one row per stage:
    * (stage_idx, stage, users).
    *
    * Each iteration joins the events of ONE type against the previous
    * stage's (user, first_ts) set — both sides hash-partitioned by
    * user, so after the first stage the exchange is reused, and the
    * reached set only shrinks. At 100 TB the |stages| passes scan the
    * (predicate-pushed) single-type slices, never the full log per
    * stage pair.
    */
  def funnel(events: DataFrame, stages: Seq[String],
      user: String = "user_id", ts: String = "ts",
      typ: String = "event_type", maxSpan: Option[String] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = events.select(col(user).as("_u"), col(ts).as("_ts"), col(typ).as("_ty"))
    // reached carries (_u, _t = first qualifying time of the previous
    // stage, _t1 = the stage-1 anchor the window is measured from)
    var reached = e.filter(col("_ty") === stages.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("_t"))
      .withColumn("_t1", col("_t"))
    val deadline = maxSpan.map(s => expr(s"INTERVAL $s"))
    def stageCount(idx: Int, name: String, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("users"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"), col("users"))
    val rows = Seq.newBuilder[DataFrame]
    rows += stageCount(1, stages.head, reached)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val inOrder = col("_ts") >= col("_t")
      val inWindow = deadline
        .map(d => inOrder && col("_ts") <= col("_t1") + d).getOrElse(inOrder)
      reached = e.filter(col("_ty") === st)
        .join(reached, "_u")
        .filter(inWindow)
        .groupBy(col("_u"))
        .agg(min(col("_ts")).as("_t"), min(col("_t1")).as("_t1"))
      rows += stageCount(i + 1, st, reached)
    }
    rows.result().reduce(_ unionByName _)
  }

  /** Top-`k` ordered event paths: the most frequent length-3 event
    * sequences (path analysis — "what do users actually do") over
    * each user's time-ordered stream, counting only triples whose
    * whole span fits in `within` (so an overnight gap doesn't stitch
    * unrelated visits into one path). Ties at the cut rank break on
    * the full path, so the top-k is deterministic.
    *
    * One shuffle keyed by user; the lead window is a streaming frame
    * (two rows of lookahead state per user, never the whole
    * sequence), and the path rollup aggregates at most
    * |event_types|³ rows — partial map-side, TakeOrdered for the cut.
    */
  def topEventPaths(events: DataFrame, k: Int, within: String = "30 minutes",
      user: String = "user_id", ts: String = "ts", typ: String = "event_type",
      eventId: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u")).orderBy(col("_ts"), col("_eid"))
    events.select(col(user).as("_u"), col(ts).as("_ts"),
        col(eventId).as("_eid"), col(typ).as("_ty"))
      .withColumn("_t2", lead(col("_ty"), 1).over(w))
      .withColumn("_t3", lead(col("_ty"), 2).over(w))
      .withColumn("_ts3", lead(col("_ts"), 2).over(w))
      .filter(col("_t3").isNotNull &&
        col("_ts3") <= col("_ts") + expr(s"INTERVAL $within"))
      .groupBy(col("_ty").as("step1"), col("_t2").as("step2"),
        col("_t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** First-order transition matrix of the event stream: for every
    * consecutive (from → to) pair in each user's time-ordered
    * sequence, the count and the exact transition probability
    * (count / out-total of `from`, rounded to the 1e-6 grid — one
    * float divide over two exact integers, cross-engine stable).
    * The Markov-chain summary behind "what happens after X" and the
    * input of next-event-prediction baselines.
    *
    * One shuffle keyed by user (lead window, 1 row of lookahead
    * state), one |types|²-row rollup, one broadcast-sized totals
    * join. Never quadratic, nothing driver-side. */
  def transitionMatrix(events: DataFrame, user: String = "user_id",
      ts: String = "ts", typ: String = "event_type",
      eventId: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_u")).orderBy(col("_ts"), col("_eid"))
    val pairs = events.select(col(user).as("_u"), col(ts).as("_ts"),
        col(eventId).as("_eid"), col(typ).as("_ty"))
      .withColumn("_next", lead(col("_ty"), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col("_ty").as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("_tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_tot"), 6).as("p"))
  }

  /** Sequence-pattern match (MATCH_RECOGNIZE-lite): encode each
    * user's time-ordered event types as one character per event (via
    * `symbols`), then count non-overlapping regex matches of
    * `pattern` over that string — "did view⁺ → click → purchase
    * happen, and how often" as a single regular expression, the
    * row-pattern surface SQL:2016 spells as MATCH_RECOGNIZE.
    *
    * Restrict `pattern` to constructs Java regex and RE2 share
    * (literals, classes, `* + ? | ()`) and it is oracle-replayable.
    * State per user = their encoded sequence (one char per event) —
    * the GROUP_CONCAT state class; at 100 TB sessionize first (the
    * session id becomes part of the key) so strings stay bounded.
    * One shuffle keyed by user; the per-user sort happens inside the
    * aggregate via sort_array over (ts, eid, char) structs. */
  def matchPattern(events: DataFrame, pattern: String,
      symbols: Map[String, String], user: String = "user_id",
      ts: String = "ts", typ: String = "event_type",
      eventId: String = "event_id"): DataFrame = {
    val sym = symbols.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(col("_ty") === k, lit(v)).otherwise(acc)
    }
    events.select(col(user).as("_u"), col(ts).as("_ts"),
        col(eventId).as("_eid"), col(typ).as("_ty"))
      .withColumn("_ch", coalesce(sym, lit("~"))) // unmapped → '~' (keep symbol values to letters)
      .groupBy(col("_u"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("_ts"), col("_eid"), col("_ch")))),
        s => s("_ch")), "").as("seq"))
      .select(col("_u").as(user), col("seq"),
        regexp_count(col("seq"), lit(pattern)).as("n_matches"))
  }

  /** Daily cohort retention: users grouped by the day of their FIRST
    * event; for each (cohort_day, day_offset) the count of that
    * cohort's users active `day_offset` days after joining, plus the
    * cohort's size (integer counts only — rates are a trivial
    * post-division we leave to the caller so the result stays
    * engine-exact).
    *
    * One co-partitioned join (events ⋈ first-day per user on the user
    * key) feeds one rollup; the per-cohort size table is |days| rows
    * and broadcasts.
    */
  def cohortRetention(events: DataFrame, user: String = "user_id",
      ts: String = "ts"): DataFrame = {
    val e = events.select(col(user).as("_u"), to_date(col(ts)).as("_day"))
    val cohorts = e.groupBy(col("_u")).agg(min(col("_day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    e.join(cohorts, "_u")
      .groupBy(col("cohort_day"),
        datediff(col("_day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("_u")).as("active_users"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"),
        col("active_users"), col("cohort_size"))
  }
}
