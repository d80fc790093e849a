package graft.queries

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.dml.{IncrementalRollup, VersionedTable}
import graft.streaming.StreamingOps

/** Streaming↔batch parity at the DRIVER gate (SURVEY §2.10 was
  * spec-only through r8): a real Structured Streaming job —
  * AvailableNow trigger, checkpointed foreachBatch upsert into the
  * versioned table, incremental rollup folded per micro-batch
  * (`StreamingOps.upsertStreamWithRollup`) — whose final materialized
  * rollup is hash-compared against DuckDB computing the same
  * upsert-then-aggregate from first principles. This pins the whole
  * streaming face: source batching, exactly-once foreachBatch commit,
  * CDC-driven incremental refresh.
  *
  * Determinism under arbitrary micro-batch ORDER: the streamed rows
  * are written as four range-partitioned files (disjoint o_orderkey
  * ranges) and consumed one file per trigger, so every key appears in
  * exactly one batch and the final merged state is independent of the
  * order the source lists files in. The rollup refresh is a fold of
  * signed deltas — also order-independent across disjoint keys.
  */
object StreamParityQueries {
  import Q._

  /** Stage `df` as numbered single-file parquet slices in `watch`,
    * with strictly increasing (pinned-literal) modification times so
    * the file stream source's (mtime, path) ordering consumes them in
    * exactly this sequence — the determinism the event-time rows need:
    * slices are ts-ordered, so the watermark (computed from batch
    * N−1's max) never passes an unprocessed event and nothing is
    * dropped as late. */
  private def stageSlices(root: Path, watch: Path, slices: Seq[DataFrame]): Unit = {
    import scala.jdk.CollectionConverters._
    // ONE job stages every slice (r16, guide §1.2 — Prof measured the
    // former one-coalesce(1)-job-per-slice loop at ~1 s of the 4–6 s
    // parity queries, each job re-reading the input): tag each row
    // with its slice index, hash-repartition on the tag (every tag
    // lands in exactly one partition, so partitionBy emits exactly
    // one file per slice), write once. File-per-slice and the pinned
    // strictly-increasing mtimes — the (mtime, path) source-order
    // contract the watermark reasoning depends on — are unchanged.
    val n = slices.size
    val union = slices.zipWithIndex
      .map { case (df, i) => df.withColumn("_slice", lit(i)) }
      .reduce(_ unionByName _)
    val stage = root.resolve("stage_all")
    union.repartition(n, col("_slice"))
      .write.partitionBy("_slice").parquet(stage.toString)
    slices.zipWithIndex.foreach { case (df, i) =>
      val dir = stage.resolve(s"_slice=$i")
      val dst = watch.resolve(f"slice_$i%02d.parquet")
      if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val part =
          try listing.iterator().asScala
            .filter(_.toString.endsWith(".parquet")).toSeq.head
          finally listing.close()
        Files.move(part, dst)
      } else {
        // an EMPTY slice writes no partition dir — stage the empty
        // single file the per-slice path used to produce, so the
        // micro-batch sequence (batch count, watermark steps) is
        // byte-identical to the former shape
        val empty = root.resolve(s"stage_empty$i")
        df.limit(0).coalesce(1).write.parquet(empty.toString)
        val listing = Files.list(empty)
        val part =
          try listing.iterator().asScala
            .filter(_.toString.endsWith(".parquet")).toSeq.head
          finally listing.close()
        Files.move(part, dst)
      }
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1704067200000L + i * 60000L))
    }
  }

  /** Four contiguous, ts-ordered slices of `ev` (epoch-second split of
    * [min, max] into equal quarters — disjoint and complete), so each
    * micro-batch is strictly later than the previous one. */
  private def tsSlices(ev: DataFrame, minE: Long, maxE: Long): Seq[DataFrame] = {
    val q = (maxE - minE) / 4 + 1
    (0 until 4).map { i =>
      ev.filter(unix_timestamp(col("ts"))
        .between(minE + i * q, minE + (i + 1) * q - 1))
    }
  }

  private def minMaxEpoch(ev: DataFrame): (Long, Long) = {
    val r = ev.agg(min(unix_timestamp(col("ts"))),
      max(unix_timestamp(col("ts")))).head
    (r.getLong(0), r.getLong(1))
  }

  /** Streaming state stores are created one per shuffle partition and
    * each commits a delta file EVERY micro-batch — at gate scale, 32
    * partitions × a handful of batches × both join sides is pure
    * checkpoint-IO overhead for kilobytes of state (the stream-stream
    * join ran 3× slower under 32). On a real cluster the inverse
    * applies: size shuffle partitions to the stream's state, not to
    * this harness. */
  private def withFewPartitions[A](s: SparkSession)(body: => A): A =
    Q.withShufflePartitions(s, 8)(body)

  val queries: Map[String, QFn] = Map(
    "q_stream_upsert_parity_v2" -> ((s, dir) => withFewPartitions(s) {
      // scoped 8 shuffle partitions: 4 micro-batch merges + rollup
      // refreshes over kilobyte deltas — see Q.withShufflePartitions.
      // withScratch: table/ckpt state must be fresh per run; the
      // localized result lets the whole tree be deleted on return
      // (r10 ADVICE: no temp-dir accumulation across bench runs).
      Q.withScratch(s, "graft_stream_parity") { rootP =>
      val root = rootP.toString
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // seed table: even keys
      val seed = orders.where(col("o_orderkey") % 2 === 0)
      val vt = VersionedTable.create(s, s"$root/table", seed)
      val view = IncrementalRollup.create(vt, s"$root/view",
        Seq("o_orderstatus"), Seq("o_totalprice"))
      // stream: keys % 3 == 0 with doubled price — overlaps half the
      // seed (updates) and inserts the odd multiples of 3
      val streamed = orders.where(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      streamed.repartitionByRange(4, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/incoming")
      val src = s.readStream.schema(streamed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/incoming")
      StreamingOps.upsertStreamWithRollup(src, vt, "o_orderkey", view,
        s"$root/ckpt")
      // avg emitted UNROUNDED: both engines divide the identical exact
      // decimal sum by the identical count in IEEE double — bit-exact
      // — whereas round(double, 6) can differ by one ulp between
      // Spark's BigDecimal HALF_UP and DuckDB's scaled-float rounding
      // at near-half 6th decimals (the COMPAT #7/#12 discipline).
      view.read()
        .select(col("o_orderstatus"), col("_cnt").as("n"),
          col("_sum_o_totalprice").cast("double").as("sum_price"),
          (col("_sum_o_totalprice").cast("double") / col("_cnt"))
            .as("avg_price"))
        .orderBy(col("o_orderstatus"))
      }
    }),

    "q_stream_window_parity" -> ((s, dir) => {
      // Watermarked event-time tumbling windows (§2.10's canonical
      // aggregate) through a REAL multi-batch run, hash-compared
      // against the batch answer: four ts-ordered slices arrive one
      // file per trigger, the 1-hour watermark advances monotonically
      // behind them (nothing is ever late), and a sentinel event 3 h
      // past the corpus pushes the final watermark beyond every real
      // window end so append mode flushes ALL windows (AvailableNow's
      // closing no-data batch performs the eviction). The sentinel's
      // own window stays unflushed by construction — the output filter
      // is belt-and-braces. Exact totals via the DECIMAL(18,2) sum.
      Q.withScratch(s, "graft_stream_winpar") { root =>
      val watch = root.resolve("incoming"); Files.createDirectories(watch)
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"), col("value"))
      val (minE, maxE) = minMaxEpoch(ev)
      val sentinel = s.sql(
        s"SELECT timestamp_seconds(${maxE + 10800}) AS ts, " +
          "'__hwm__' AS event_type, CAST(0 AS DOUBLE) AS value")
      stageSlices(root, watch, tsSlices(ev, minE, maxE) :+ sentinel)
      withFewPartitions(s) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        src.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
          .select(col("window.start").cast("timestamp_ntz").as("w_start"),
            col("event_type"), col("n"), d(col("sv")).as("total"))
          .writeStream.format("parquet")
          .option("path", root.resolve("out").toString)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(root.resolve("out").toString)
        .filter(col("event_type") =!= "__hwm__")
        .orderBy(col("w_start"), col("event_type"))
      }
    }),

    "q_stream_join_parity" -> ((s, dir) => {
      // STREAM-STREAM interval join parity: view→purchase attribution
      // within 30 minutes (`StreamingOps.attributionJoin`) over two
      // file streams batched in ts-aligned slices, against DuckDB's
      // batch interval join. Inner pairs emit eagerly in the batch
      // where the later side arrives, so no sentinel is needed; the
      // 1-hour watermark exceeds the 30-minute horizon, so a view's
      // state provably outlives every conversion that can still match
      // it (eviction bound view_ts + 30 min < watermark), making the
      // emitted SET independent of the batching. This certifies both
      // sides' state retention + the derived eviction horizon — the
      // unbounded-join guard a 100 TB stream relies on.
      Q.withScratch(s, "graft_stream_joinpar") { root =>
      val watchV = root.resolve("views"); val watchC = root.resolve("convs")
      Files.createDirectories(watchV); Files.createDirectories(watchC)
      val ev = t(s, dir, "events").select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
      val (minE, maxE) = minMaxEpoch(ev)
      val views = ev.filter(col("event_type") === "view")
      val convs = ev.filter(col("event_type") === "purchase")
      stageSlices(root.resolve("stv"), watchV, tsSlices(views, minE, maxE))
      stageSlices(root.resolve("stc"), watchC, tsSlices(convs, minE, maxE))
      withFewPartitions(s) {
        val srcV = s.readStream.schema(views.schema)
          .option("maxFilesPerTrigger", 1).parquet(watchV.toString)
        val srcC = s.readStream.schema(convs.schema)
          .option("maxFilesPerTrigger", 1).parquet(watchC.toString)
        StreamingOps.attributionJoin(srcV, srcC, watermark = "1 hour",
            horizonMinutes = 30)
          .writeStream.format("parquet")
          .option("path", root.resolve("out").toString)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(root.resolve("out").toString)
        .select(col("user_id"), col("view_id"), col("conv_id"),
          col("view_ts").cast("timestamp_ntz").as("view_ts"),
          col("conv_ts").cast("timestamp_ntz").as("conv_ts"), col("value"))
        .orderBy(col("user_id"), col("view_id"), col("conv_id"))
      }
    }),

    "q_stream_dedup_parity" -> ((s, dir) => {
      // Streaming EXACT dedup parity (`StreamingOps.dedupStream`,
      // spec-only until now): documents arrive in four ts-ordered
      // slices, duplicates split ACROSS micro-batches, and the
      // survivor set must equal DuckDB's batch DISTINCT-by-content.
      // Determinism without fixing which twin survives: the output
      // projects functions of the TEXT alone (md5, length), which all
      // exact twins share, so any survivor yields identical rows. The
      // watermark delay (5 h) exceeds the 4 h synthetic ts spread, so
      // no state is evicted mid-run — the bounded-state eviction
      // property itself is StreamingSpec's job; this row gates the
      // cross-batch exactly-one-survivor semantics.
      Q.withScratch(s, "graft_stream_dedup") { root =>
      val watch = root.resolve("incoming"); Files.createDirectories(watch)
      // the corpus has no exact twins at gate scale — plant them:
      // every 5th document re-arrives ~2.8 h later under a new id, so
      // the dedup must DROP it across micro-batches or the output
      // multiset gains rows the DISTINCT oracle does not have
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = base.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000)
      val docs = base.unionByName(twins)
        .withColumn("ts",
          timestamp_seconds(lit(1704067200L) + (col("doc_id") % 14400)))
      val (minE, maxE) = minMaxEpoch(docs)
      stageSlices(root.resolve("st"), watch, tsSlices(docs, minE, maxE))
      withFewPartitions(s) {
        val src = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        StreamingOps.dedupStream(src, watermark = "5 hours")
          .select(col("content_hash").as("h"),
            length(col("text")).cast("long").as("len"))
          .writeStream.format("parquet")
          .option("path", root.resolve("out").toString)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(root.resolve("out").toString).orderBy(col("h"))
      }
    }),

    "q_stream_decontam_parity" -> ((s, dir) => {
      // Streaming n-gram decontamination parity
      // (`StreamingOps.decontaminateStream`, spec-only until now):
      // the corpus streams in four ts-ordered slices against the
      // BROADCAST benchmark shingle set (doc_id % 20 = 7 — the same
      // split as the batch q_decontaminate family), and every kept
      // doc must carry the exact distinct-shared-shingle count DuckDB
      // derives from first principles. The groupBy state finalizes in
      // append mode only when the watermark passes each doc's event
      // time, so a sentinel 3 h past the corpus flushes all real
      // groups (the q_stream_window_parity pattern); the sentinel's
      // negative id filters it out of the gate output.
      Q.withScratch(s, "graft_stream_decon") { root =>
      val watch = root.resolve("incoming"); Files.createDirectories(watch)
      val all = t(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 20 === 7)
        .select(col("doc_id"), col("text"))
      val corpus = all.filter(col("doc_id") % 20 =!= 7)
        .select(col("doc_id"), col("text"))
        .withColumn("ts",
          timestamp_seconds(lit(1704067200L) + (col("doc_id") % 14400)))
      val (minE, maxE) = minMaxEpoch(corpus)
      val sentinel = s.sql(
        s"SELECT CAST(-1 AS BIGINT) AS doc_id, 'x' AS text, " +
          s"timestamp_seconds(${maxE + 10800}) AS ts")
      stageSlices(root.resolve("st"), watch,
        tsSlices(corpus, minE, maxE) :+ sentinel)
      withFewPartitions(s) {
        val src = s.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        // NOTE: the sentinel must NOT be filtered inside the stream —
        // a doc_id predicate here pushes down to the parquet scan,
        // drops the sentinel at the source, and the watermark never
        // advances (observed: zero rows flushed). Its own group can
        // never flush itself (wm = its ts − 1 h), so the post-hoc
        // batch-read filter below is belt-and-braces only.
        StreamingOps.decontaminateStream(src, bench, minHits = 5,
            watermark = "1 hour")
          .select(col("doc_id"), col("n_hits"))
          .writeStream.format("parquet")
          .option("path", root.resolve("out").toString)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(root.resolve("out").toString)
        .filter(col("doc_id") >= 0)
        .orderBy(col("doc_id"))
      }
    }),

    // CHECKPOINT RESTART / exactly-once across process boundaries
    // (VERDICT r11 #5 — the streaming property a 100 TB pipeline leans
    // on hardest): the upsert-with-rollup pipeline processes slices
    // 1–2, TERMINATES, then a brand-new query reopens the SAME
    // checkpoint for slices 3–4, and a third restart with no new data
    // must be a pure no-op. The final rollup hash-matches the batch
    // answer — any replayed batch would double the signed-delta fold,
    // any dropped batch would miss keys, so equality pins
    // no-duplicate/no-loss across both restarts. Pinned booleans:
    // the first run made partial progress (restart actually resumed
    // mid-stream, not re-read everything), and the idle restart
    // published no new version.
    "q_stream_restart_parity" -> ((s, dir) => withFewPartitions(s) {
      Q.withScratch(s, "graft_stream_restart") { rootP =>
      val root = rootP.toString
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val seed = orders.where(col("o_orderkey") % 2 === 0)
      val vt = VersionedTable.create(s, s"$root/table", seed)
      val view = IncrementalRollup.create(vt, s"$root/view",
        Seq("o_orderstatus"), Seq("o_totalprice"))
      val streamed = orders.where(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      // stage 4 disjoint-key slice files; reveal only the first half
      streamed.repartitionByRange(4, col("o_orderkey"))
        .write.parquet(s"$root/staged")
      val staged = {
        import scala.jdk.CollectionConverters._
        val l = Files.list(rootP.resolve("staged"))
        try l.iterator().asScala.filter(_.toString.endsWith(".parquet"))
          .toSeq.sortBy(_.getFileName.toString)
        finally l.close()
      }
      val watch = rootP.resolve("incoming"); Files.createDirectories(watch)
      def reveal(ps: Seq[Path]): Unit = ps.foreach { p =>
        Files.move(p, watch.resolve(p.getFileName))
      }
      def run(): Unit = {
        val src = s.readStream.schema(streamed.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        StreamingOps.upsertStreamWithRollup(src, vt, "o_orderkey", view,
          s"$root/ckpt")
      }
      val (firstHalf, secondHalf) = staged.splitAt(staged.length / 2)
      reveal(firstHalf)
      run() // run 1: slices 1–2, then the query terminates
      val midCount = vt.read().count()
      reveal(secondHalf)
      run() // run 2: SAME checkpoint resumes with slices 3–4 only
      val fullCount = vt.read().count()
      val fullVersion = vt.currentVersion
      run() // run 3: idle restart — must publish nothing
      val seedCount = seed.count()
      val midProgress = midCount > seedCount && midCount < fullCount
      val idleNoop = vt.currentVersion == fullVersion &&
        vt.read().count() == fullCount
      view.read()
        .select(col("o_orderstatus"), col("_cnt").as("n"),
          col("_sum_o_totalprice").cast("double").as("sum_price"),
          (col("_sum_o_totalprice").cast("double") / col("_cnt"))
            .as("avg_price"))
        .withColumn("mid_progress", lit(midProgress))
        .withColumn("idle_noop", lit(idleNoop))
        .orderBy(col("o_orderstatus"))
      }
    }),

    "q_stream_neardup_parity" -> ((s, dir) => {
      // Streaming MinHash near-dup detection vs a STATIC corpus
      // (`StreamingOps.nearDupVsCorpus`, spec-only until now): odd
      // documents stream in four slices, band-bucket-join the even
      // half's precomputed LSH index, verify candidates by exact
      // Jaccard, and the emitted pair set must equal DuckDB's
      // all-pairs odd×even ground truth. The verify threshold sits at
      // 0.75 — ON the 16×4 banding knee, not below it (ADVICE r11):
      // at 0.6 any regenerated fixture with a pair in [0.6, 0.75)
      // could deterministically miss it (up to ~11% per such pair)
      // and flake the row red; at ≥ 0.75 the analytic miss bound is
      // < 0.003 per pair (Dedup.minhashMissProb), so oracle equality
      // is a property of the OPERATOR, not of one fixture's gap.
      // Stateless bucket join → pairs emit on arrival; the only state
      // is the emit-dedup watermark, so no sentinel is needed.
      Q.withScratch(s, "graft_stream_ndup") { root =>
      val watch = root.resolve("incoming"); Files.createDirectories(watch)
      val all = t(s, dir, "documents")
      val corpus = all.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
      val streamDocs = all.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"))
        .withColumn("ts",
          timestamp_seconds(lit(1704067200L) + (col("doc_id") % 14400)))
      val (minE, maxE) = minMaxEpoch(streamDocs)
      stageSlices(root.resolve("st"), watch, tsSlices(streamDocs, minE, maxE))
      withFewPartitions(s) {
        val src = s.readStream.schema(streamDocs.schema)
          .option("maxFilesPerTrigger", 1).parquet(watch.toString)
        StreamingOps.nearDupVsCorpus(src, corpus, threshold = 0.75)
          .select(col("stream_id"), col("corpus_id"), col("jaccard"))
          .writeStream.format("parquet")
          .option("path", root.resolve("out").toString)
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(root.resolve("out").toString)
        .orderBy(col("stream_id"), col("corpus_id"))
      }
    })
  )

  val oracle: Map[String, String] = Map(
    // final state from first principles: streamed keys take the
    // doubled price (insert-or-replace), untouched seed keys keep
    // theirs; exact-decimal sum per the Q discipline
    "q_stream_upsert_parity_v2" ->
      """WITH final AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the batch answer from first principles: every event keyed to its
    // 15-minute bucket (hour trunc + quarter offset — identical to
    // Spark's epoch-aligned window()), exact DECIMAL totals
    "q_stream_window_parity" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |b AS (SELECT event_type, value,
        |    date_trunc('hour', ts) + INTERVAL 15 MINUTE * CAST(floor(minute(ts)/15) AS INT) AS w_start
        |  FROM e)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM b GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    // the batch interval join the streaming pipeline must reproduce
    "q_stream_join_parity" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
        |v AS (SELECT user_id, ts AS view_ts, event_id AS view_id FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id AS c_user, ts AS conv_ts, event_id AS conv_id, value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, c.conv_id, v.view_ts, c.conv_ts, c.value
        |FROM v JOIN c ON c.c_user = v.user_id AND c.conv_ts >= v.view_ts
        |  AND c.conv_ts <= v.view_ts + INTERVAL 30 MINUTE
        |ORDER BY user_id, view_id, conv_id""".stripMargin,

    // same final state as the single-run upsert parity — the restart
    // must be invisible in the answer; booleans pin the protocol
    "q_stream_restart_parity" ->
      """WITH final AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  TRUE AS mid_progress, TRUE AS idle_noop
        |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the batch twin: one row per distinct content (any survivor of
    // an exact-twin set projects to the same (md5, length) pair)
    "q_stream_dedup_parity" ->
      """SELECT DISTINCT md5(text) AS h, CAST(length(text) AS BIGINT) AS len
        |FROM documents ORDER BY h""".stripMargin,

    // the batch twin of the streaming decontamination: distinct
    // shared-shingle counts per corpus doc vs the benchmark slice,
    // kept iff < 5 (HygieneQueries.shingleCte is the shared shingle
    // rule — trigram sets, whole-text fallback for short docs)
    "q_stream_decontam_parity" ->
      s"""WITH ${HygieneQueries.shingleCte},
        |bench AS (SELECT DISTINCT unnest(s) AS ng FROM sh WHERE doc_id % 20 = 7),
        |corp AS (SELECT doc_id, unnest(s) AS ng FROM sh WHERE doc_id % 20 <> 7),
        |hit AS (SELECT c.doc_id, COUNT(*) AS h
        |        FROM corp c JOIN bench b USING (ng) GROUP BY c.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(hit.h, 0) AS BIGINT) AS n_hits
        |FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        |WHERE d.doc_id % 20 <> 7 AND COALESCE(hit.h, 0) < 5
        |ORDER BY d.doc_id""".stripMargin,

    // all-pairs odd×even exact-Jaccard ground truth (the batch
    // q_dedup_minhash oracle restricted to the stream/corpus split) —
    // equality also measures the banded index's end-to-end recall.
    // Threshold 0.75 = the banding knee (see the query comment): the
    // oracle-equality claim holds for ANY corpus, not just this one.
    "q_stream_neardup_parity" ->
      s"""WITH ${HygieneQueries.shingleCte}
        |SELECT stream_id, corpus_id, jaccard FROM (
        |  SELECT a.doc_id AS stream_id, b.doc_id AS corpus_id,
        |    len(list_intersect(a.s, b.s))::DOUBLE
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0) t
        |WHERE jaccard >= 0.75 ORDER BY stream_id, corpus_id""".stripMargin
  )
}
