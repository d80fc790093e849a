package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Funnel / cohort semantics on handcrafted event logs — the cases a
  * hash match against a same-shaped oracle can't isolate: an
  * out-of-order stage event must NOT count, the same-instant boundary
  * must, and a returning user must not restart their cohort. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, minute: Int, ty: String) =
    (u, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), ty)

  test("funnel counts only in-order stage sequences, same-instant inclusive") {
    val events = Seq(
      // A: view -> click -> purchase, fully in order
      ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase"),
      // B: click BEFORE first view — reaches stage 1 only
      ev(2, 1, "click"), ev(2, 2, "view"),
      // C: view only
      ev(3, 5, "view"),
      // D: view and click at the SAME instant — boundary is inclusive
      ev(4, 7, "view"), ev(4, 7, "click"),
      // E: purchase with no view at all — reaches nothing
      ev(5, 9, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel uses first-touch: a later re-view cannot resurrect an early click") {
    // F clicks at t=2, views at t=1 and t=5: first view is t=1, so the
    // t=2 click qualifies (first-touch anchor, not latest-touch)
    val events = Seq(ev(6, 1, "view"), ev(6, 2, "click"), ev(6, 5, "view"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("view", "click"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L), (2, "click", 1L)))
  }

  test("funnel emits a zero-count row for a stage nobody reaches") {
    val events = Seq(ev(1, 1, "view")).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 1L), (2, "click", 0L), (3, "purchase", 0L)),
      "empty stages report 0, not a dropped row")
  }

  test("windowed funnel: the deadline anchors to the stage-1 first touch") {
    val events = Seq(
      // A converts fully inside 10 min of the first view
      ev(1, 1, "view"), ev(1, 3, "click"), ev(1, 8, "purchase"),
      // B clicks in time, purchases AFTER the window → stage 2 only
      ev(2, 1, "view"), ev(2, 5, "click"), ev(2, 30, "purchase"),
      // C's click is outside the window even though ordered
      ev(3, 1, "view"), ev(3, 20, "click"),
      // D: boundary — click exactly AT first_view + 10 min counts
      ev(4, 10, "view"), ev(4, 20, "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"),
        maxSpan = Some("10 minutes"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 3L), (3, "purchase", 1L)))
  }

  test("topEventPaths: ordered triples per user, span-bounded, deterministic ties") {
    def e(id: Long, u: Long, minute: Int, ty: String) =
      (id, u, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), ty)
    val events = Seq(
      // user 1: A B C D in 3 minutes → triples ABC, BCD
      e(1, 1, 0, "A"), e(2, 1, 1, "B"), e(3, 1, 2, "C"), e(4, 1, 3, "D"),
      // user 2: A B then C 40 min later → ABC span exceeds 30 min, dropped
      e(5, 2, 0, "A"), e(6, 2, 1, "B"), e(7, 2, 41, "C"),
      // user 3: another ABC inside the window
      e(8, 3, 10, "A"), e(9, 3, 11, "B"), e(10, 3, 12, "C")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.topEventPaths(events, k = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("A", "B", "C", 2L), ("B", "C", "D", 1L)),
      "user 2's over-span triple must not count; ABC outranks BCD")
  }

  test("cohort retention anchors each user to their first day") {
    def e(u: Long, day: Int) = (u, Timestamp.valueOf(f"2026-01-$day%02d 09:00:00"))
    val events = Seq(
      e(1, 1), e(1, 2), e(1, 4),    // day-1 cohort, back at +1 and +3
      e(2, 1),                      // day-1 cohort, never returns
      e(3, 2), e(3, 4), e(3, 4)     // day-2 cohort, back at +2 (dup-counted once)
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(events)
      .orderBy("cohort_day", "day_offset")
      .select(date_format(col("cohort_day"), "dd").cast("int"),
        col("day_offset"), col("active_users"), col("cohort_size"))
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 0, 2L, 2L), (1, 1, 1L, 2L), (1, 3, 1L, 2L),
      (2, 0, 1L, 1L), (2, 2, 1L, 1L)))
  }
}
