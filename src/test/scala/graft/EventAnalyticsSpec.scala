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

  test("event family differential test vs driver-side models on random logs") {
    // seeded log: 25 users, events clustered in a 2-hour window of a
    // random day (dense enough for 30-min path triples, spread enough
    // for multi-day cohorts), duplicate timestamps included
    // (exercises the event_id tie-break)
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val log = (1L to 400L).map { eid =>
      val u = 1L + rnd.nextInt(25)
      val minute = rnd.nextInt(3) * 1440 + rnd.nextInt(120)
      val ty = Seq("view", "click", "purchase", "error")(rnd.nextInt(4))
      (eid, u, new Timestamp(base + minute * 60000L), ty)
    }
    val d = log.toDF("event_id", "user_id", "ts", "event_type")
    val stages = Seq("view", "click", "purchase")
    val spanMs = 6 * 60 * 60 * 1000L // "6 hours"

    // model: first-touch funnel, optional deadline from the stage-1 anchor
    def modelFunnel(deadline: Option[Long]): Seq[Long] = {
      val byUser = log.groupBy(_._2)
      def reach(u: Long): Int = {
        val evs = byUser(u)
        def firstAt(stage: String, atOrAfter: Long, anchor: Option[Long]): Option[Long] =
          evs.filter(e => e._4 == stage && e._3.getTime >= atOrAfter &&
              deadline.forall(dl => anchor.forall(a => e._3.getTime <= a + dl)))
            .map(_._3.getTime).minOption
        firstAt(stages(0), Long.MinValue, None) match {
          case None => 0
          case Some(t1) =>
            firstAt(stages(1), t1, Some(t1)) match {
              case None => 1
              case Some(t2) => if (firstAt(stages(2), t2, Some(t1)).isDefined) 3 else 2
            }
        }
      }
      val reached = byUser.keys.toSeq.map(reach)
      (1 to 3).map(k => reached.count(_ >= k).toLong)
    }
    def gotFunnel(span: Option[String]): Seq[Long] =
      EventAnalytics.funnel(d, stages, maxSpan = span)
        .orderBy("stage_idx").as[(Int, String, Long)].collect().map(_._3).toSeq
    assert(gotFunnel(None) == modelFunnel(None), "plain funnel ≡ model")
    assert(gotFunnel(Some("6 hours")) == modelFunnel(Some(spanMs)),
      "windowed funnel ≡ model")

    // model: cohort retention
    val day = 24 * 60 * 60 * 1000L
    val userDays = log.groupBy(_._2).view
      .mapValues(_.map(e => (e._3.getTime - base) / day).distinct).toMap
    val cohortOf = userDays.view.mapValues(_.min).toMap
    val mCohort = (for {
      (u, ds) <- userDays.toSeq; o <- ds.map(_ - cohortOf(u))
    } yield (cohortOf(u), o, u)).groupBy(t => (t._1, t._2)).map { case ((c, o), xs) =>
      (c, o) -> (xs.map(_._3).distinct.size.toLong,
        cohortOf.values.count(_ == c).toLong)
    }
    val gotCohort = EventAnalytics.cohortRetention(d).collect().map { r =>
      val c = (r.getDate(0).getTime - base) / day
      (c, r.getInt(1).toLong) -> (r.getLong(2), r.getLong(3))
    }.toMap
    assert(gotCohort == mCohort, "cohort retention ≡ model")

    // model: span-bounded path triples (count map — k large, no cut)
    val within = 30 * 60 * 1000L
    val mPaths = log.groupBy(_._2).values.flatMap { evs =>
      val s = evs.sortBy(e => (e._3.getTime, e._1))
      s.sliding(3).filter(_.size == 3)
        .filter(w => w(2)._3.getTime <= w(0)._3.getTime + within)
        .map(w => (w(0)._4, w(1)._4, w(2)._4))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotPaths = EventAnalytics.topEventPaths(d, k = 1000).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(gotPaths == mPaths, "event paths ≡ model")
    assert(mPaths.nonEmpty && mCohort.nonEmpty)
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

  test("scd2: no-op suppression, null-safe attr compare, interval chaining") {
    import spark.implicits._
    // user 1: A, A (suppressed), B, B (suppressed), A — 3 versions
    // user 2: null, null (suppressed: null <=> null), X — 2 versions
    val log = Seq(
      (1L, 1L, Some("A")), (1L, 2L, Some("A")), (1L, 3L, Some("B")),
      (1L, 4L, Some("B")), (1L, 5L, Some("A")),
      (2L, 1L, None), (2L, 2L, None), (2L, 3L, Some("X"))
    ).toDF("k", "t", "state")
    val got = graft.operators.Scd2.build(log, key = Seq("k"), ts = "t",
        attrs = Seq("state"))
      .orderBy("k", "valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some("A"), 1L, Some(3L), false),
      (1L, Some("B"), 3L, Some(5L), false),
      (1L, Some("A"), 5L, None, true),
      (2L, None, 1L, Some(3L), false),
      (2L, Some("X"), 3L, None, true)))
  }
}
