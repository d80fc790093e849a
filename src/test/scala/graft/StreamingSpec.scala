package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event

/** Structured Streaming surface: watermarked windowed aggregation,
  * stateful sessionization, and AvailableNow parquet ingest. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, uid: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), uid, typ, v)

  test("watermarked windowed counts over an event stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.windowedCounts(input.toDF(), watermark = "10 minutes",
        window_ = "15 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update).start()
    input.addData(
      ev(1, 1, 1, "click", 1.0), ev(2, 5, 1, "click", 2.0),
      ev(3, 16, 2, "view", 3.0), ev(4, 31, 2, "click", 4.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, total FROM wc ORDER BY w_start, event_type")
      .as[(String, Long, Double)].collect().toSeq
    q.stop()
    assert(rows == Seq(("click", 2L, 3.0), ("view", 1L, 3.0), ("click", 1L, 4.0)))
  }

  test("streaming ANN probe finds a perturbed corpus vector, ignores an unrelated one") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.t(spark, sfDir, "embeddings").limit(64)
      .selectExpr("vec_id", "cast(embedding AS array<double>) AS embedding")
    val base = corpus.filter($"vec_id" === 7L)
      .select("embedding").as[Seq[Double]].head()
    val near = base.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.001 else 0.0) }
    val far = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val input = MemoryStream[(Long, Timestamp, Seq[Double])]
    val q = StreamingOps.annProbeStream(
        input.toDF().toDF("doc_id", "ts", "embedding"), corpus,
        threshold = 0.9, numTables = 8)
      .writeStream.format("memory").queryName("annprobe")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (100L, Timestamp.valueOf("2026-01-01 10:00:00"), near),
      (101L, Timestamp.valueOf("2026-01-01 10:00:01"), far))
    q.processAllAvailable()
    // duplicate arrival within the watermark emits once
    input.addData((100L, Timestamp.valueOf("2026-01-01 10:00:05"), near))
    q.processAllAvailable()
    val rows = spark.sql("SELECT stream_id, corpus_id, cosine FROM annprobe")
      .as[(Long, Long, Double)].collect().toSeq
    q.stop()
    assert(rows.count(r => r._1 == 100L && r._2 == 7L && r._3 > 0.99) == 1,
      s"expected exactly one (100 -> 7) hit in $rows")
    assert(!rows.exists(_._1 == 101L), s"unrelated vector matched: $rows")
  }

  test("streaming LOCF gap-fill: dense minute grid, carries across batches, cap + late-drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.locfStream(spark, input.toDS(),
        stepMs = 60000L, maxTicksPerGap = 5)
      .writeStream.format("memory").queryName("locf")
      .outputMode(OutputMode.Append).start()
    // batch 1: user 1 observes at :01 and :04 (2-gap), user 2 at :02
    input.addData(ev(1, 1, 1, "m", 10.0), ev(2, 4, 1, "m", 40.0),
      ev(3, 2, 2, "m", 7.0))
    q.processAllAvailable()
    // batch 2: user 1 at :06 (cross-batch gap :05), a late event at
    // :03 (grid already past — dropped), user 2 jumps to :20 with a
    // 17-tick gap capped at 5
    input.addData(ev(4, 6, 1, "m", 60.0), ev(5, 3, 1, "m", 99.0),
      ev(6, 20, 2, "m", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM locf").as[StreamingOps.Tick].collect()
      .map(t => (t.user_id, t.tick_ts.toString.substring(11, 16), t.value,
        t.observed)).toSet
    val u1 = rows.filter(_._1 == 1L)
    assert(u1 == Set(
      (1L, "10:01", 10.0, true), (1L, "10:02", 10.0, false),
      (1L, "10:03", 10.0, false), (1L, "10:04", 40.0, true),
      (1L, "10:05", 40.0, false), (1L, "10:06", 60.0, true)),
      s"user 1 got $u1")
    val u2 = rows.filter(_._1 == 2L)
    // capped gap: only the 5 ticks before :20 fill (:15..:19)
    assert(u2 == Set(
      (2L, "10:02", 7.0, true),
      (2L, "10:15", 7.0, false), (2L, "10:16", 7.0, false),
      (2L, "10:17", 7.0, false), (2L, "10:18", 7.0, false),
      (2L, "10:19", 7.0, false), (2L, "10:20", 9.0, true)),
      s"user 2 got $u2")
  }

  test("streaming OHLC bars: open/close track the (ts, event_id) order across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.ohlcStream(input.toDF(), watermark = "10 minutes",
        window_ = "15 minutes")
      .writeStream.format("memory").queryName("ohlc").outputMode(OutputMode.Update).start()
    // batch 1: out-of-ts-order arrivals inside the 10:00 window
    input.addData(ev(2, 5, 1, "click", 7.0), ev(1, 1, 1, "click", 3.0))
    q.processAllAvailable()
    // batch 2: an earlier-ts straggler (still above watermark) must
    // RETAKE open, and a same-ts close tie resolves by event_id
    input.addData(ev(3, 0, 2, "click", 9.0), ev(5, 5, 2, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.sql(
        "SELECT open, high, low, close, n FROM ohlc WHERE event_type = 'click'")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    q.stop()
    // open = ts 10:00 (id 3), close = ts 10:05 tie → max id 5, value 1.0
    assert(rows.lastOption.contains((9.0, 9.0, 1.0, 1.0, 4L)))
  }

  test("stream-stream interval join: conversions attribute to in-horizon views only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamingOps.attributionJoin(views.toDF(), buys.toDF(),
        watermark = "10 minutes", horizonMinutes = 30)
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    // user 1: view at 10:01; buys at 10:11 (in horizon) and 10:45
    // (beyond 30 min). user 2: buy at 10:05 with NO prior view.
    views.addData(ev(1, 1, 1, "view", 0.0))
    buys.addData(ev(10, 11, 1, "purchase", 5.0),
      ev(11, 45, 1, "purchase", 7.0), ev(12, 5, 2, "purchase", 9.0))
    q.processAllAvailable()
    // a second batch: view for user 2 AFTER its buy — must not match
    // (conv_ts >= view_ts), and a matching later buy does
    views.addData(ev(2, 50, 2, "view", 0.0))
    buys.addData(ev(13, 55, 2, "purchase", 3.0))
    q.processAllAvailable()
    val rows = spark.sql(
        "SELECT user_id, view_id, conv_id, value FROM attr ORDER BY conv_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    q.stop()
    assert(rows == Seq((1L, 1L, 10L, 5.0), (2L, 2L, 13L, 3.0)),
      "exactly the in-horizon, view-before-buy pairs attribute")
  }

  test("streaming heavy hitters: per-window sketch across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.topKStream(input.toDF(), k = 8,
        watermark = "10 minutes", window_ = "15 minutes")
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update).start()
    // two batches into the same window: sketch state must merge
    input.addData(ev(1, 1, 1, "click", 1.0), ev(2, 3, 1, "view", 1.0))
    q.processAllAvailable()
    input.addData(ev(3, 5, 2, "click", 1.0), ev(4, 16, 2, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT w_start, item, est, err FROM hh")
      .as[(Timestamp, String, Long, Long)].collect().toSeq
    q.stop()
    // Update mode re-emits a window on every batch that touches it;
    // the final state per (window, item) is the max est (counts only
    // grow) — what a sink upsert retains. k >= universe -> exact.
    val fin = rows.groupBy(r => (r._1, r._2))
      .map { case (_, vs) => vs.maxBy(_._3) }
      .map(r => (r._1.toString.substring(11, 16), r._2, r._3, r._4)).toSet
    assert(fin == Set(
      ("10:00", "click", 2L, 0L),
      ("10:00", "view", 1L, 0L),
      ("10:15", "view", 1L, 0L)))
  }

  test("stateful sessionization with mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // two addData blocks → state must merge across batches; a bounded
    // AvailableNow run drains both (ProcessingTimeTimeout keeps an
    // unbounded query re-triggering, which would wedge
    // processAllAvailable in a test)
    input.addData(ev(1, 0, 7, "click", 1.0), ev(2, 5, 7, "view", 2.0))
    input.addData(ev(3, 9, 7, "click", 4.0), ev(4, 2, 8, "view", 8.0))
    val q = StreamingOps.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sess = spark.sql("SELECT * FROM sess").as[StreamingOps.Session].collect()
      .groupBy(_.user_id).map { case (u, ss) => u -> ss.maxBy(_.n_events) }
    assert(sess(7L).n_events == 3 && sess(7L).total_value == 7.0)
    assert(sess(8L).n_events == 1 && sess(8L).total_value == 8.0)
    assert(sess(7L).first_ts < sess(7L).last_ts)
  }

  test("streaming funnel advances per-user stage state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 7 progresses view→click in batch 1, purchase in batch 2
    // (state carries across); user 8's click BEFORE any view must not
    // advance; user 9 views only
    input.addData(
      ev(1, 1, 7, "view", 0), ev(2, 2, 7, "click", 0),
      ev(3, 1, 8, "click", 0), ev(4, 2, 8, "view", 0),
      ev(5, 3, 9, "view", 0))
    input.addData(
      ev(6, 9, 7, "purchase", 0),
      ev(7, 9, 9, "error", 0))
    val q = StreamingOps.funnelStream(spark, input.toDS(),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("sfunnel").outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val reach = spark.sql("SELECT user_id, stage_idx FROM sfunnel")
      .as[(Long, Int)].collect().groupBy(_._1).map { case (u, s) =>
        u -> s.map(_._2).max }
    assert(reach == Map(7L -> 3, 8L -> 1, 9L -> 1),
      "7 converts across batches; 8's early click ignored; 9 stalls at view")
    // per-stage live totals = count of progress rows per stage_idx
    val byStage = spark.sql("SELECT stage_idx, count(*) FROM sfunnel GROUP BY 1")
      .as[(Int, Long)].collect().toMap
    assert(byStage == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("streaming funnel conversion window anchors to stage 1") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // click 4 min after view: inside a 5-min window; purchase 20 min
    // after the anchor: outside
    input.addData(ev(1, 0, 5, "view", 0), ev(2, 4, 5, "click", 0),
      ev(3, 20, 5, "purchase", 0))
    val q = StreamingOps.funnelStream(spark, input.toDS(),
        Seq("view", "click", "purchase"), maxSpanMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sfunnelw").outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val stages = spark.sql("SELECT stage_idx FROM sfunnelw").as[Int].collect().toSet
    assert(stages == Set(1, 2), "purchase past the window must not advance")
  }

  test("streaming exact dedup keeps first occurrence within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Doc]
    val q = StreamingOps.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("sdedup").outputMode(OutputMode.Append).start()
    def doc(id: Long, minute: Int, text: String) =
      StreamingOps.Doc(id, Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"), text)
    input.addData(doc(1, 0, "alpha beta"), doc(2, 1, "gamma delta"), doc(3, 2, "alpha beta"))
    q.processAllAvailable()
    input.addData(doc(4, 3, "alpha beta"), doc(5, 4, "epsilon zeta")) // dup across batches
    q.processAllAvailable()
    val ids = spark.sql("SELECT doc_id FROM sdedup").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 5L))
  }

  test("streaming near-dup probe against a static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest while the hunter waits quietly near the old bridge"
    val corpus = Seq((100L, base),
      (101L, "columnar engines scan parquet row groups with vectorized readers at scale " +
        "and prune partitions using min max statistics from the file footers"))
      .toDF("doc_id", "text")
    val input = MemoryStream[StreamingOps.Doc]
    val q = StreamingOps.nearDupVsCorpus(input.toDF(), corpus)
      .writeStream.format("memory").queryName("sneardup").outputMode(OutputMode.Append).start()
    input.addData(
      StreamingOps.Doc(1, Timestamp.valueOf("2026-01-01 10:00:00"),
        base.replace("quietly", "loudly")), // near-dup of corpus 100
      StreamingOps.Doc(2, Timestamp.valueOf("2026-01-01 10:01:00"),
        "totally unrelated text about cooking pasta with tomato sauce and fresh basil leaves"))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT stream_id, corpus_id FROM sneardup")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(pairs == Set((1L, 100L)))
  }

  test("streaming decontamination drops overlapping docs, keeps clean ones") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val input = MemoryStream[StreamingOps.Doc]
    val q = StreamingOps.decontaminateStream(input.toDF(), bench, minHits = 3)
      .writeStream.format("memory").queryName("sdecon").outputMode(OutputMode.Append).start()
    input.addData(
      StreamingOps.Doc(1, Timestamp.valueOf("2026-01-01 10:00:00"),
        "the quick brown fox jumps over a sleeping cat"), // shares >= 3 shingles
      StreamingOps.Doc(2, Timestamp.valueOf("2026-01-01 10:01:00"),
        "totally unrelated text about cooking pasta with basil"),
      // advance the watermark past the docs above so the append-mode
      // aggregation emits them
      StreamingOps.Doc(3, Timestamp.valueOf("2026-01-01 12:30:00"),
        "late arrival far past the horizon"))
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM sdecon").as[Long].collect().toSet
    q.stop()
    assert(kept.contains(2L) && !kept.contains(1L))
  }

  test("streaming upsert lands each micro-batch as one transactional MERGE") {
    implicit val sqlCtx = spark.sqlContext
    val loc = Files.createTempDirectory("graft_stream_tbl").toString
    val ckpt = Files.createTempDirectory("graft_stream_uckpt").toString
    val t = graft.dml.VersionedTable.create(spark, loc,
      Seq((1L, "seed_1", 10.0), (2L, "seed_2", 20.0)).toDF("id", "name", "bal"))
    val v0 = t.currentVersion
    val input = MemoryStream[(Long, String, Double)]
    input.addData((2L, "updated_2", 99.0), (3L, "new_3", 30.0))
    StreamingOps.upsertStream(input.toDF().toDF("id", "name", "bal"), t, "id", ckpt)
    assert(t.currentVersion == v0 + 1, "one batch = one version")
    val now = t.read()
    assert(now.count() == 3)
    assert(now.filter($"id" === 2L).select("name").as[String].head() == "updated_2")
    assert(now.filter($"id" === 1L).select("bal").as[Double].head() == 10.0)
    // drained checkpoint: a re-run with no new data commits nothing
    StreamingOps.upsertStream(input.toDF().toDF("id", "name", "bal"), t, "id", ckpt)
    assert(t.currentVersion == v0 + 1)
    // a second batch lands as the next version; CDC shows its net diff
    input.addData((3L, "renamed_3", 33.0))
    StreamingOps.upsertStream(input.toDF().toDF("id", "name", "bal"), t, "id", ckpt)
    assert(t.currentVersion == v0 + 2)
    val diff = t.changes(v0 + 1, v0 + 2)
    assert(diff.filter($"_change" === "insert").select("name").as[String].head()
      == "renamed_3")
    assert(diff.filter($"_change" === "delete").select("name").as[String].head()
      == "new_3")
  }

  test("streaming upsert keeps a live rollup current per batch, and crash-replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_rollup").toString
    val ckpt = s"$root/ckpt"
    val t = graft.dml.VersionedTable.create(spark, s"$root/table",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "v"))
    val view = graft.dml.IncrementalRollup.create(t, s"$root/view",
      Seq("grp"), Seq("v"))
    def state(): Map[String, (Long, Double)] =
      view.read().collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("_cnt"),
            r.getAs[java.math.BigDecimal]("_sum_v").doubleValue)).toMap
    val input = MemoryStream[(Long, String, Double)]
    // batch 1: update id=2 (b: 20→5), insert id=3 (a += 7)
    input.addData((2L, "b", 5.0), (3L, "a", 7.0))
    StreamingOps.upsertStreamWithRollup(
      input.toDF().toDF("id", "grp", "v"), t, "id", view, ckpt)
    assert(view.baseVersion == t.currentVersion)
    assert(state() == Map("a" -> (2L, 17.0), "b" -> (1L, 5.0)))
    // drained checkpoint: replay commits nothing, rollup untouched
    val v1 = t.currentVersion
    StreamingOps.upsertStreamWithRollup(
      input.toDF().toDF("id", "grp", "v"), t, "id", view, ckpt)
    assert(t.currentVersion == v1 && state()("a") == (2L, 17.0))
    // batch 2 folds in as one more delta
    input.addData((1L, "a", 100.0))
    StreamingOps.upsertStreamWithRollup(
      input.toDF().toDF("id", "grp", "v"), t, "id", view, ckpt)
    assert(state() == Map("a" -> (2L, 107.0), "b" -> (1L, 5.0)))
  }

  test("stream-stream attribution: clicks join impressions within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamingOps.attributionStream(imps.toDF(), clicks.toDF(),
        watermark = "5 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    // user 1: click 6 min after impression (inside horizon);
    // user 2: click 20 min after (outside); user 3: click BEFORE the
    // impression (range excludes); cross-user pairs excluded by key
    imps.addData(ev(10, 1, 1, "imp", 0), ev(20, 5, 2, "imp", 0), ev(30, 30, 3, "imp", 0))
    clicks.addData(ev(11, 7, 1, "click", 0), ev(21, 25, 2, "click", 0),
      ev(31, 29, 3, "click", 0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT imp_id, click_id FROM attr")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(rows == Set((10L, 11L)))
  }

  test("stream-stream left-outer attribution emits unmatched impressions after the horizon closes") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamingOps.attributionStream(imps.toDF(), clicks.toDF(),
        watermark = "5 minutes", horizon = "10 minutes", leftOuter = true)
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append).start()
    imps.addData(ev(10, 1, 1, "imp", 0), ev(20, 2, 2, "imp", 0))
    clicks.addData(ev(11, 7, 1, "click", 0))
    q.processAllAvailable()
    // advance BOTH watermarks far past imp_ts + horizon so the
    // unmatched impression (user 2) is provably unattributable
    imps.addData(ev(90, 55, 9, "imp", 0))
    clicks.addData(ev(91, 55, 9, "click", 0))
    q.processAllAvailable()
    imps.addData(ev(92, 59, 8, "imp", 0))
    clicks.addData(ev(93, 59, 8, "click", 0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT imp_id, click_id FROM attr_outer")
      .as[(Long, Option[Long])].collect().toSet
    q.stop()
    assert(rows.contains((10L, Some(11L))))   // matched pair
    assert(rows.contains((20L, None)))        // proven-unmatched emitted once
  }

  test("AvailableNow ingest drains the stream into parquet exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val input = MemoryStream[Event]
    input.addData((1 to 20).map(i => ev(i.toLong, i % 60, i % 3, "click", i.toDouble)): _*)
    StreamingOps.ingest(input.toDF(), out, ckpt)
    assert(spark.read.parquet(out).count() == 20)
    // second run with no new data appends nothing (checkpointed offset)
    StreamingOps.ingest(input.toDF(), out, ckpt)
    assert(spark.read.parquet(out).count() == 20)
  }

  test("scd2Stream: closed versions match the batch builder across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.scd2Stream(spark, input.toDS(), _.event_type)
      .writeStream.format("memory").queryName("scd2s")
      .outputMode(OutputMode.Append).start()
    // batch 1: A@:01, A@:02 (no-op extends), B@:03 closes [.:01, :03)
    input.addData(ev(1, 1, 1, "A", 0), ev(2, 2, 1, "A", 0), ev(3, 3, 1, "B", 0))
    q.processAllAvailable()
    // batch 2: A@:05 closes B's version from CARRIED state; a late
    // duplicate at :02 must not reopen anything
    input.addData(ev(4, 5, 1, "A", 0), ev(5, 2, 1, "Z", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM scd2s ORDER BY valid_from")
      .as[StreamingOps.ClosedVersion].collect().toSeq
      .map(v => (v.state, v.valid_from.toString.substring(14, 16),
        v.valid_to.toString.substring(14, 16)))
    assert(got == Seq(("A", "01", "03"), ("B", "03", "05")), s"got $got")
    // batch equivalence: the closed half of Scd2.build on the same log
    val log = Seq((1L, 1, "A", 1L), (1L, 2, "A", 2L), (1L, 3, "B", 3L),
        (1L, 5, "A", 4L))
      .map { case (u, m, st, id) =>
        (u, Timestamp.valueOf(f"2026-01-01 10:$m%02d:00"), id, st) }
      .toDF("user_id", "ts", "event_id", "state")
    val batch = graft.operators.Scd2.build(log, Seq("user_id"), "ts",
        Seq("state"), Seq("event_id"))
      .filter(!org.apache.spark.sql.functions.col("is_current"))
      .orderBy("valid_from")
      .select("state", "valid_from", "valid_to")
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).toString.substring(14, 16),
        r.getTimestamp(2).toString.substring(14, 16))).toSeq
    assert(batch == got, s"stream $got vs batch $batch")
  }

  test("driftStream: EWMA+CUSUM recurrences carry across batches, late events drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingOps.driftStream(spark, input.toDS(),
        alpha = 0.5, target = 10.0, slack = 0.0, h = 25.0)
      .writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append).start()
    // batch 1: user 1 at :01 (x=10) and :02 (x=20)
    input.addData(ev(1, 1, 1, "m", 10.0), ev(2, 2, 1, "m", 20.0))
    q.processAllAvailable()
    // batch 2: :03 (x=30) continues the recursion from carried state;
    // the :01 duplicate is late beyond repair and must be dropped
    input.addData(ev(3, 3, 1, "m", 30.0), ev(4, 1, 1, "m", 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM drift ORDER BY ts")
      .as[StreamingOps.Smoothed].collect().toSeq
    // ewma: 10, .5*20+.5*10=15, .5*30+.5*15=22.5 — identical to the
    // batch Resample.ewma recurrence; late x=99 emitted nothing
    assert(rows.map(_.ewma) == Seq(10.0, 15.0, 22.5))
    // cusum sp: max(0,0+0)=0, max(0,0+10)=10, max(0,10+20)=30 -> alarm
    assert(rows.map(_.sp) == Seq(0.0, 10.0, 30.0))
    assert(rows.map(_.alarm) == Seq(false, false, true))
  }
}
