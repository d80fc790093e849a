package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{Chunking, Decontamination, Dedup, TextAnalysis}

/** Profiling main for optimization work — times sub-stages of the
  * heavy operators in isolation (median-of-3, noop sink, runtime
  * file/row/shuffle counts off the QueryStats listener). Not part of
  * the driver contract; a local measurement tool in the spirit of
  * guide §1 (measure first).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.registerAll(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, reps: Int = 3)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      // give the async listener bus a moment, then fold runtime IO
      Thread.sleep(1500)
      val st = graft.plans.QueryStats.snapshot().take(6)
      val files = st.map(_.files_read).max
      val rows = st.map(_.scan_rows).max
      val shuf = st.map(_.shuffle_bytes).max
      graft.plans.QueryStats.clear()
      println(f"PROF $name%-40s median=${ts.sorted.apply(reps / 2)}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")} files=$files rows=$rows shufKB=${shuf / 1024}")
    }
    val docs = Tables.t(spark, sfDir, "documents")
    println("docs count: " + docs.count())

    // --- simhash pipeline decomposition (kernel evals vs pair work) ---
    val d0 = docs
      .filter(size(graft.llm.TextAnalysis.tokens(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
    val off = 1000000L
    val doubled = d0.unionByName(d0.withColumn("doc_id", col("doc_id") + lit(off)))
    time("simhash_kernel_N") {
      noop(d0.select(col("doc_id"),
        call_function("simhash64_md5", col("text")).as("simhash")))
    }
    time("simhash_kernel_2N") {
      noop(doubled.select(col("doc_id"),
        call_function("simhash64_md5", col("text")).as("simhash")))
    }
    time("simhash_pairs_plain") {
      noop(Dedup.simhashDupPairs(docs, maxDist = 8))
    }
    time("simhash_pairs_doubled") {
      val sh = doubled.select(col("doc_id"),
        call_function("simhash64_md5", col("text")).as("simhash"))
      noop(Dedup.bandedHashPairs(sh, "doc_id", "simhash", maxDist = 8))
    }

    // --- graph kcore decomposition (per-round fixed cost) ---
    val li = Tables.t(spark, sfDir, "lineitem")
    val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val eGr = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("pa"), col("pb"))
    time("kcore_edges_only") { noop(eGr) }
    time("kcore_full", reps = 1) {
      noop(graft.operators.KCore.coreness(eGr, "pa", "pb")
        .groupBy(col("coreness")).agg(count(lit(1)).as("n_nodes")))
    }
    time("graphrank_full", reps = 1) {
      val liG = li.select(
        concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      val edges = liG.union(liG.select(col("dst").as("src"), col("src").as("dst")))
      noop(graft.operators.GraphRank.pageRank(edges, "src", "dst", iterations = 3))
    }

    // --- resolve / keepbest (dupClusters consumers) ---
    time("resolve_full") {
      noop(Dedup.nearDedup(docs, Dedup.jaccardDupPairs(docs, threshold = 0.6))
        .select(col("doc_id"), col("lang"), col("source")))
    }
    time("clusters_full") {
      noop(Dedup.dupClusters(Dedup.jaccardDupPairs(docs, threshold = 0.6)))
    }
    time("keepbest_full") {
      noop(Dedup.nearDedupBest(docs, Dedup.jaccardDupPairs(docs, threshold = 0.6),
        col("n_chars")).select(col("doc_id"), col("n_chars"), col("source")))
    }

    // --- jaccardDupPairs decomposition ---
    // sets_stage_write_read is the A/B probe that killed the r16
    // staging experiment: it prices materializing the hashed sets
    // (8 B/shingle ≈ 8× the compressed text) against
    // shingle_kernel_scan (re-running the codegen'd kernel) — the
    // kernel re-run wins at every measured scale.
    time("jaccard_full") { noop(Dedup.jaccardDupPairs(docs, threshold = 0.6)) }
    time("jaccard_candidates") {
      Dedup.jaccardCandidateCount(docs, 0.6)
    }
    time("sets_stage_write_read") {
      val dir = graft.sources.Scratch.newDir(spark, "profsets") + "/sets"
      val projected = docs
        .select(col("doc_id").as("_id"),
          call_function("shingle_set", col("text"), lit(3)).as("_s0"))
        .select(col("_id"), size(col("_s0")).as("_n"),
          transform(col("_s0"), x => xxhash64(x)).as("_set"))
      projected.write.mode("overwrite").parquet(dir)
      noop(spark.read.parquet(dir))
    }
    time("minhash_full") { noop(Dedup.minhashDupPairs(docs, threshold = 0.6)) }
    time("shingle_kernel_scan") {
      noop(docs.select(col("doc_id"),
        call_function("shingle_set", col("text"), lit(3)).as("_s")))
    }
    time("md5_groupby_probe") {
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text")).as("_ck"))
        .groupBy(col("_ck")).agg(count(lit(1)).as("_k"))
        .filter(col("_k") > 1).isEmpty
    }
    // --- streaming parity decomposition (VERDICT r15 #6) ---
    // how much of a parity query is Spark's per-lifecycle machinery
    // (query start/stop, per-batch planning + checkpoint commits)
    // versus work this repo controls (slice staging, the stateful op)?
    // floor_1batch: ONE trivial row through a full AvailableNow
    // lifecycle with checkpoint + parquet sink = the fixed cost any
    // streaming gate pays. floor_5batch: same with 5 single-row files,
    // maxFilesPerTrigger=1 = floor + 4 marginal batch costs.
    // stateful_5batch: adds a watermarked groupBy (state store
    // lifecycle at 8 partitions). stage_slices: the harness-side
    // slice write the queries pay before streaming starts.
    def lifecycle(nFiles: Int, stateful: Boolean): Unit =
      queries.Q.withShufflePartitions(spark, 8) {
        queries.Q.withScratch(spark, "prof_stream") { root =>
          val watch = root.resolve("in")
          java.nio.file.Files.createDirectories(watch)
          (0 until nFiles).foreach { i =>
            val f = spark.sql(s"SELECT timestamp_seconds(${1704067200L + i * 3600L}) AS ts, " +
              s"CAST($i AS BIGINT) AS k, CAST(1.0 AS DOUBLE) AS v")
            val st = root.resolve(s"st$i")
            f.coalesce(1).write.parquet(st.toString)
            val l = java.nio.file.Files.list(st)
            val part = try {
              import scala.jdk.CollectionConverters._
              l.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq.head
            } finally l.close()
            val dst = watch.resolve(f"s_$i%02d.parquet")
            java.nio.file.Files.move(part, dst)
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime.fromMillis(1704067200000L + i * 60000L))
          }
          val src = spark.readStream
            .schema("ts TIMESTAMP, k BIGINT, v DOUBLE")
            .option("maxFilesPerTrigger", 1).parquet(watch.toString)
          val q = if (stateful)
            src.withWatermark("ts", "10 minutes")
              .groupBy(window(col("ts"), "15 minutes"), col("k"))
              .agg(sum(col("v")).as("sv"))
          else src.select(col("k"), col("v"))
          q.writeStream.format("parquet")
            .option("path", root.resolve("out").toString)
            .option("checkpointLocation", root.resolve("ckpt").toString)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start().awaitTermination()
          spark.read.schema("k BIGINT").parquet(root.resolve("out").toString)
            .select(col("k"))
        }
      }: Unit
    time("stream_floor_1batch") { lifecycle(1, stateful = false) }
    time("stream_floor_5batch") { lifecycle(5, stateful = false) }
    time("stream_stateful_5batch") { lifecycle(5, stateful = true) }
    time("stream_stage_slices_events") {
      queries.Q.withScratch(spark, "prof_slices") { root =>
        val watch = root.resolve("in")
        java.nio.file.Files.createDirectories(watch)
        val ev = Tables.t(spark, sfDir, "events")
          .select(col("ts"), col("event_type"), col("value"))
        val r = ev.agg(min(unix_timestamp(col("ts"))),
          max(unix_timestamp(col("ts")))).head
        val (minE, maxE) = (r.getLong(0), r.getLong(1))
        val qspan = (maxE - minE) / 4 + 1
        (0 until 4).foreach { i =>
          val df = ev.filter(unix_timestamp(col("ts"))
            .between(minE + i * qspan, minE + (i + 1) * qspan - 1))
          val st = root.resolve(s"st$i")
          df.coalesce(1).write.parquet(st.toString)
          val l = java.nio.file.Files.list(st)
          val part = try {
            import scala.jdk.CollectionConverters._
            l.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq.head
          } finally l.close()
          java.nio.file.Files.move(part, watch.resolve(f"slice_$i%02d.parquet"))
        }
        spark.range(1).toDF("k")
      }: Unit
    }
    Seq("q_stream_window_parity", "q_stream_upsert_parity_v2",
        "q_stream_restart_parity", "q_stream_join_parity").foreach { qn =>
      time(s"full_$qn", reps = 1) { noop(SparkEntry.queries(qn)(spark, sfDir)) }
    }

    // --- pipeline_e2e stages ---
    val d1 = Dedup.exactDedup(docs)
    time("e2e_d1_exactDedup") { noop(d1) }
    val pairs = Dedup.jaccardDupPairs(d1, threshold = 0.6)
    time("e2e_pairs_over_d1") { noop(pairs) }
    val d2 = Dedup.nearDedup(d1, pairs)
    time("e2e_d2_nearDedup") { noop(d2) }
    val bench = docs.filter(col("doc_id") % 20 === 7)
    val corpus = d2.filter(col("doc_id") % 20 =!= 7)
    val d3 = Decontamination.decontaminate(corpus, bench, minHits = 5)
    time("e2e_d3_decontaminate") { noop(d3) }
    val good = TextAnalysis.profiles(d3)
      .select(col("doc_id"), floor(col("quality") * 1e6).cast("long").as("_q6"))
      .filter(col("_q6") >= 100000)
      .select(col("doc_id"))
    val d4 = d3.join(good, "doc_id")
    time("e2e_d4_profiles") { noop(d4) }
    time("e2e_full_chunk") {
      noop(Chunking.chunk(d4.select("doc_id", "text"), chunkTokens = 128)
        .join(d4.select("doc_id", "source"), "doc_id")
        .groupBy(col("source")).agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_tok")).as("sum_tokens"))
        .orderBy(col("source")))
    }
    spark.stop()
  }
}
