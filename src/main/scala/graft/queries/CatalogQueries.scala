package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.InfoSchema

/** INFORMATION_SCHEMA analog queries — the reference's
  * `columnstore_extents` / `columnstore_files` / `columnstore_tables` /
  * `columnstore_columns` plugin tables (`dbcon/mysql/is_columnstore_*.cpp`)
  * re-expressed over parquet footers. DuckDB's independent footer
  * readers (`parquet_metadata` / `parquet_file_metadata` /
  * `parquet_schema`) make every view hash-checkable: two engines decode
  * the SAME footer bytes through disjoint implementations.
  */
object CatalogQueries {

  private def oracleSfDir: String =
    sys.props.getOrElse("graft.oracle.sfDir", "/root/testdata/sf0.01")

  // session-scoped staging memos (content is invocation-independent;
  // bench repeats each query many times — re-staging per run scales
  // with the scale factor, the q_catalog_governor lesson). The
  // join-reorder staging memo is the session catalog itself
  // (tableExists under this lock) — see q_opt_joinreorder.
  private val jrStageLock = new Object
  private case class ZStage(path: String, zCk: Long, zTp: Long,
      cklo: Double, ckhi: Double, tplo: Double, tphi: Double)
  private val zStaged =
    new java.util.concurrent.ConcurrentHashMap[String, ZStage]()

  val queries: Map[String, Q.QFn] = Map(
    // Extent analog: per row-group column-chunk stats of `orders`.
    // Restricted to plain INT64/BYTE_ARRAY chunks in the ORACLE-facing
    // projection: logical-typed columns (timestamps, decimals) render
    // min/max through engine-specific logical decoding, which would
    // test the formatter, not the footer.
    // Only UNANNOTATED INT64 and UTF8 BYTE_ARRAY chunks face the
    // oracle: logical-typed stats (timestamps, decimals) render
    // through engine-specific formatters, which would test the
    // formatter, not the footer decode.
    "q_catalog_extents" -> ((s, dir) =>
      InfoSchema.extents(s, dir, Seq("orders"))
        .where(col("physical_type").isin("INT64", "BYTE_ARRAY") &&
          (col("converted_type").isNull || col("converted_type") === "UTF8"))
        .select(
          col("table_name"), col("file_name"),
          col("row_group").cast("long").as("row_group"),
          col("column_name"), col("physical_type"),
          col("num_values"), col("null_count"),
          col("min_value"), col("max_value"),
          col("compressed_bytes"), col("uncompressed_bytes"))
        .orderBy(col("file_name"), col("row_group"), col("column_name"))),

    // Tables rollup: file/row-group/row counts across the whole dir.
    "q_catalog_tables" -> ((s, dir) =>
      InfoSchema.tables(s, dir, graft.Tables.all)
        .select(col("table_name"), col("file_count").cast("long").as("file_count"),
          col("rows").as("n_rows"), col("row_groups").cast("long").as("row_groups"))
        .orderBy(col("table_name"))),

    // Column catalog: footer schema (physical + converted type).
    "q_catalog_columns" -> ((s, dir) =>
      InfoSchema.columns(s, dir, Seq("orders", "events", "documents"))
        .select(col("table_name"), col("column_name"),
          col("physical_type"),
          coalesce(col("converted_type"), lit("NONE")).as("converted_type"),
          col("repetition"))
        .orderBy(col("table_name"), col("column_name"))),

    // File inventory: footer-derived per-file shape (row count from
    // summed block row counts — the reference's SEGMENT file listing).
    "q_catalog_files" -> ((s, dir) =>
      InfoSchema.files(s, dir, Seq("lineitem", "orders", "events"))
        .select(col("table_name"), col("file_name"),
          col("row_groups").cast("long").as("row_groups"), col("rows").as("n_rows"))
        .orderBy(col("table_name"), col("file_name"))),

    // queryStats analog (`plans/QueryStats.scala`; reference
    // `utils/querystats/querystats.h`, surfaced via calGetStats()):
    // run a FIXED query mix through the listener, then read the stats
    // ring back as a table. Deterministic slice only: the mix scans
    // the constant-size region (5 rows) / nation (25 rows) tables —
    // the same row counts at EVERY scale factor — and the volatile
    // telemetry (durations, byte sizes) is collapsed to pinned-TRUE
    // booleans. Ring rows are classified by telemetry shape, not by
    // name: the listener runs on the async bus thread where the
    // submitting thread's job-description local property is not
    // visible.
    "q_catalog_querystats" -> ((s, dir) => {
      import graft.plans.QueryStats
      QueryStats.install(s)
      QueryStats.clear()
      // plain scans (no exchange — count() would add a single-partition
      // shuffle) + one genuine shuffle aggregate
      Q.t(s, dir, "nation").select(col("n_nationkey")).collect()
      Q.t(s, dir, "region").select(col("r_regionkey")).collect()
      Q.t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n")).collect()
      // the listener bus is async — poll until all three mix shapes
      // have landed in the ring (QueryStatsSpec's await discipline)
      def classify(): Map[String, QueryStats.StatRow] = {
        val rows = QueryStats.snapshot()
        def pick(p: QueryStats.StatRow => Boolean) = rows.find(p)
        Seq(
          "qs_nation_count" -> pick(r => r.scan_rows == 25 && r.shuffle_bytes == 0),
          "qs_region_count" -> pick(r => r.scan_rows == 5 && r.shuffle_bytes == 0),
          "qs_nation_group" -> pick(r => r.scan_rows == 25 && r.shuffle_bytes > 0))
          .collect { case (n, Some(r)) => n -> r }.toMap
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var found = classify()
      while (found.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(50); found = classify()
      }
      import s.implicits._
      found.toSeq.sortBy(_._1).map { case (n, r) =>
        (n, r.scan_rows, r.files_read >= 1, r.bytes_read > 0,
          r.shuffle_bytes > 0, r.duration_ms >= 0 && r.error.isEmpty)
      }.toDF("name", "scan_rows", "files_ok", "bytes_ok", "shuffled", "ok")
        .orderBy(col("name"))
    }),

    // ANALYZE statistics surface (`plans/Analyze.scala`; reference
    // `utils/common/statistics.h` StatisticsManager → rowestimator):
    // compute catalog column statistics on the scale-invariant nation
    // table and read back what the CBO will see. NDV comes from
    // Spark's HLL++ — exact at 25/5 distinct values — and the oracle
    // RECOMPUTES ndv/min/max/nulls from the data (string min/max is
    // not collected by Spark → pinned 'NULL', matching DESCRIBE's
    // rendering). Certifies the whole loop: saveAsTable → ANALYZE →
    // catalog stats readback.
    "q_catalog_analyze" -> ((s, dir) => {
      import graft.plans.Analyze
      val cols = Seq("n_nationkey", "n_regionkey", "n_name")
      val tbl = Analyze.analyzed(s, Q.t(s, dir, "nation"),
        "graft_analyze_nation", cols)
      import s.implicits._
      cols.sorted.map { c =>
        val m = Analyze.columnStats(s, tbl, c)
        def k(key: String) = m.getOrElse(key, "NULL")
        (c, k("distinct_count").trim.toLong, k("min"), k("max"),
          k("num_nulls").trim.toLong)
      }.toDF("column", "ndv", "min_v", "max_v", "nulls")
        .orderBy(col("column"))
    }),

    // Bucketed co-located join (`plans/Bucketing.scala`; the analog of
    // the reference routing rows to PMs by key so PM-side joins probe
    // locally): both sides bucketed on the join key, broadcast
    // disabled so nothing can hide a shuffle, and the plan-level
    // guarantee — the join ran WITHOUT any hash exchange — faces the
    // gate as a pinned-TRUE column next to the value-checked join
    // result. At 100 TB this is the difference between a full network
    // shuffle of the fact table and purely local hash work.
    "q_layout_bucketjoin" -> ((s, dir) => {
      import graft.plans.Bucketing
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = s.conf.get(key)
      s.conf.set(key, "-1")
      try {
        Bucketing.writeBucketed(
          Q.t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
          "graft_bkt_orders", "o_orderkey", 8)
        Bucketing.writeBucketed(
          Q.t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
          "graft_bkt_lineitem", "l_orderkey", 8)
        val j = Bucketing.table(s, "graft_bkt_lineitem")
          .join(Bucketing.table(s, "graft_bkt_orders"),
            col("l_orderkey") === col("o_orderkey"))
        val free = Bucketing.isShuffleFree(j)
        j.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            Q.sumDec(col("l_extendedprice")).as("rev"))
          .withColumn("join_shuffle_free", lit(free))
          .orderBy(col("o_orderstatus"))
      } finally s.conf.set(key, prev)
    }),

    // Stats-driven join REORDER (the spanning-tree join ordering of
    // jlf_tuplejoblist, ref dbcon/joblist/jlf_tuplejoblist.cpp:1607):
    // the query is WRITTEN with the two big tables joining first and
    // the selective 25-row dim last; with ANALYZE stats on all three
    // inputs, CostBasedJoinReorder must pull the dim ahead of the
    // big-big join. The reorder proof (dim among the first two leaves
    // of the optimized plan) is pinned TRUE next to the value-checked
    // aggregate — reordering must be a pure optimization.
    "q_opt_joinreorder" -> ((s, dir) => {
      import graft.plans.Analyze
      // stage + ANALYZE once per (session, dir): tables and stats are
      // pure functions of the input dir; the collision-free dir digest
      // lets two dirs coexist in one JVM (test suites share the
      // session). The memo is the CATALOG itself (tableExists), not a
      // JVM-static map — a map entry would go stale if the shared
      // session is stopped and recreated in the same JVM (ADVICE r11),
      // because managed session-scoped tables die with their session.
      val sfx = Q.dirDigest(dir)
      val (tOrd, tCust, tNat) =
        (s"graft_jr_orders_$sfx", s"graft_jr_customer_$sfx", s"graft_jr_nation_$sfx")
      jrStageLock.synchronized {
        if (!(s.catalog.tableExists(tOrd) && s.catalog.tableExists(tCust) &&
            s.catalog.tableExists(tNat))) {
          Analyze.analyzed(s, Q.t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")), tOrd)
          Analyze.analyzed(s, Q.t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey")), tCust)
          Analyze.analyzed(s, Q.t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_regionkey"), col("n_name")), tNat)
        }
      }
      val df = s.sql(
        s"""SELECT n.n_name, o.o_totalprice
          |FROM $tOrd o
          |JOIN $tCust c ON o.o_custkey = c.c_custkey
          |JOIN $tNat n ON c.c_nationkey = n.n_nationkey
          |WHERE n.n_regionkey = 0""".stripMargin)
      val names = Seq(tOrd, tCust, tNat)
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString).map(x => names.find(x.contains).getOrElse("?"))
      val dimEarly = leaves.indexOf(tNat) < 2
      df.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), Q.sumDec(col("o_totalprice")).as("price_sum"))
        .withColumn("dim_joined_early", lit(dimEarly))
        .orderBy(col("n_name"))
    }),

    // Runtime bloom-filter injection (the casual-partition/extent-
    // elimination analog: the SELECTIVE side's runtime values prune
    // the big side's scan before the join): on by default with
    // cluster-calibrated size gates (application side must scan
    // > 10 GB), lowered here to fire at gate scale exactly as
    // PlanSpec does. The injection proof — `might_contain` in the
    // optimized plan — rides along as a pinned-TRUE column next to
    // the value-checked join aggregate. At 100 TB this is the
    // difference between scanning the full fact table and only the
    // row groups that can possibly match the urgent orders.
    "q_opt_bloomjoin" -> ((s, dir) => {
      val confs = Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
      val olds = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        val li = Q.t(s, dir, "lineitem")
        val ord = Q.t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Q.sumDec(col("l_quantity")).as("qty_sum"))
        val injected =
          j.queryExecution.optimizedPlan.toString.contains("might_contain")
        // localize INSIDE the conf scope: the lazy DataFrame would
        // otherwise execute after the finally restores the default
        // 10 GB gates, and the pinned proof would describe a plan that
        // never ran — the bloom-filtered plan must be the executed one
        Q.localize(s, j.withColumn("bloom_injected", lit(injected))
          .orderBy(col("o_orderpriority")))
      } finally olds.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }),

    // Z-ORDER clustered layout (`sources/ZOrder.scala`; the
    // multi-dimensional extent-elimination analog — casual-partition
    // min/max pruning that stays selective on BOTH predicate columns
    // at once): orders rewritten as 16 z-ordered files on
    // (o_custkey, o_totalprice); a center box predicate over both
    // dims is value-checked against DuckDB on the raw table, and the
    // layout guarantee — the box overlaps ≤ 3/4 of the files on EACH
    // dimension independently — rides along as a pinned-TRUE column
    // (LayoutSpec keeps the comparative flat/single-sort baselines
    // and the zipf-skew equi-depth property). The band bounds are
    // lo + 0.45·(hi−lo) .. lo + 0.55·(hi−lo) computed with the same
    // IEEE expression shape on both engines, so the box edges are
    // bit-identical.
    "q_layout_zorder" -> ((s, dir) => {
      import graft.sources.ZOrder
      val nFiles = 16
      // layout + overlap counts + band bounds are pure functions of
      // the input dir — staged once per session (stagedOnce cleans at
      // JVM exit), so bench repeats measure the box aggregate, not a
      // full re-clustering of orders per run
      val st = zStaged.computeIfAbsent(dir, _ => {
        val orders = Q.t(s, dir, "orders")
        val root = Q.stagedOnce(s"zorder:$dir") { p =>
          ZOrder.writeZOrdered(orders, s"$p/z",
            Seq("o_custkey", "o_totalprice"), nFiles)
        }
        val zDf = s.read.parquet(s"$root/z")
        val r = orders.agg(
          min(col("o_custkey").cast("double")), max(col("o_custkey").cast("double")),
          min(col("o_totalprice")), max(col("o_totalprice"))).head
        def band(lo: Double, hi: Double): (Double, Double) =
          (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
        val (cklo, ckhi) = band(r.getDouble(0), r.getDouble(1))
        val (tplo, tphi) = band(r.getDouble(2), r.getDouble(3))
        ZStage(s"$root/z",
          ZOrder.filesOverlapping(zDf, "o_custkey", cklo, ckhi),
          ZOrder.filesOverlapping(zDf, "o_totalprice", tplo, tphi),
          cklo, ckhi, tplo, tphi)
      })
      s.read.parquet(st.path)
        .filter(col("o_custkey").cast("double").between(st.cklo, st.ckhi) &&
          col("o_totalprice").between(st.tplo, st.tphi))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("key_sum"),
          Q.sumDec(col("o_totalprice")).as("price_sum"))
        .withColumn("pruned_both_dims",
          lit(st.zCk <= nFiles * 3 / 4 && st.zTp <= nFiles * 3 / 4))
    }),

    // ALTER TABLE schema evolution (`sources/Catalog.scala`; reference
    // `dbcon/ddlpackage/ddl.y` ALTER grammar executed by ddlproc):
    // ADD COLUMN then DROP COLUMN as pure metadata over two file
    // generations — gen-1 files lack the added column (read as NULL),
    // gen-2 files carry it; after the DROP, BOTH generations project
    // the dropped column away at scan time. O(metadata) at any table
    // size; the oracle rebuilds both phases from the raw tables.
    // withScratch: the catalog mutates schema per run (create → add →
    // drop), so staging is fresh per invocation and deleted after the
    // result is localized (r10 ADVICE: no temp-dir accumulation).
    "q_catalog_evolution" -> ((s, dir) => Q.withScratch(s, "graft_evo_q") { whp =>
      import graft.sources.Catalog
      val wh = whp.toString
      val cat = new Catalog(wh, s)
      cat.createTable("evo", "n_nationkey BIGINT, n_name VARCHAR(30)")
      Q.t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        .write.mode("append").parquet(cat.tableLocation("evo"))
      cat.addColumn("evo", "score DOUBLE")
      Q.t(s, dir, "region")
        .select((col("r_regionkey") + 100).as("n_nationkey"),
          col("r_name").as("n_name"),
          (col("r_regionkey") * 1.5).as("score"))
        .write.mode("append").parquet(cat.tableLocation("evo"))
      val merged = cat.load("evo") // schema captured BEFORE the drop
      cat.dropColumn("evo", "n_name")
      val dropped = cat.load("evo")
      merged.select(lit("with_name").as("phase"), col("n_nationkey"),
          col("n_name"), col("score"))
        .unionByName(dropped.select(lit("dropped").as("phase"),
          col("n_nationkey"), lit(null).cast("string").as("n_name"),
          col("score")))
        .orderBy(col("phase"), col("n_nationkey"))
    }),

    // Partition lifecycle at the gate (`sources/Catalog.scala`
    // disable/enable/dropPartition; ref `ha_mcs_partition.cpp:484-575`
    // — a DISABLED partition's data stays on disk but is excluded
    // from scans, DROP removes it permanently). Scale-free: nation
    // (25 rows, 5 region partitions) at every sf. Each phase emits
    // its decision surface — on-disk partition-dir count (disable
    // keeps the dir, drop deletes it), visible row count, and the
    // targeted keys' visible rows (0 while excluded) — all recomputed
    // by the oracle from the raw table. O(metadata) at any scale:
    // disable writes one marker file, drop unlinks one directory.
    "q_catalog_partition" -> ((s, dir) => Q.withScratch(s, "graft_part_q") { whp =>
      import graft.sources.Catalog
      val cat = new Catalog(whp.toString, s)
      cat.createTable("pn", "n_nationkey BIGINT, n_name VARCHAR(30), n_regionkey BIGINT")
      cat.writePartitioned("pn",
        Q.t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        "n_regionkey")
      def phase(name: String): (String, Long, Long, Long, Long) = {
        val df = cat.loadPartitioned("pn")
        (name, cat.partitions("pn").size.toLong, df.count(),
          df.filter(col("n_regionkey") === 2).count(),
          df.filter(col("n_regionkey") === 4).count())
      }
      val p1 = phase("p1_all")
      cat.disablePartition("pn", "n_regionkey=2")
      val p2 = phase("p2_disabled2")
      cat.enablePartition("pn", "n_regionkey=2")
      val p3 = phase("p3_reenabled")
      cat.dropPartition("pn", "n_regionkey=4")
      val p4 = phase("p4_dropped4")
      import s.implicits._
      Seq(p1, p2, p3, p4)
        .toDF("phase", "part_dirs", "n_rows", "rows_r2", "rows_r4")
        .orderBy(col("phase"))
    }),

    // Admission control (`plans/ResourceGovernor.scala`; the
    // ResourceManager REFUSAL the reference can issue up front —
    // docs/MEMORY.md "the one real divergence", closed with code):
    // price a partition-pruned query vs the full scan from PLANNING
    // metadata only, set the budget between the two, and certify at
    // the gate that the pruned query ADMITS while the full scan is
    // REFUSED before execution. Byte prices vary with scale factor,
    // so the gate sees the decisions, not the prices.
    "q_catalog_governor" -> ((s, dir) => {
      import graft.plans.ResourceGovernor
      // partitioned copy staged ONCE per session (content is
      // invocation-independent; bench repeats this query many times
      // and the former per-run rewrite leaked a dataset copy per
      // invocation and cost a full write ∝ sf each run — r10 ADVICE)
      val root = Q.stagedOnce(s"gov_evp:$dir") { p =>
        Q.t(s, dir, "events").withColumn("part", col("user_id") % 8)
          .write.partitionBy("part").parquet(p.toString + "/evp")
      }
      val all = s.read.parquet(root + "/evp")
      def rollup(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val priceAll = ResourceGovernor.price(rollup(all))
      val prunedDf = rollup(all.where(col("part") === 3))
      val pricePruned = ResourceGovernor.price(prunedDf)
      def refused(t: Throwable): Boolean = {
        var c = t
        while (c != null) {
          if (c.isInstanceOf[ResourceGovernor.QueryRejectedException]) return true
          c = c.getCause
        }
        false
      }
      val key = "spark.graft.admission.maxScanBytes"
      s.conf.set(key, ((pricePruned + priceAll) / 2).toString)
      val (prunedRows, fullRefused) =
        try {
          val n = prunedDf.collect().length
          val r = try { rollup(all).collect(); false }
            catch { case t: Throwable => refused(t) }
          (n, r)
        } finally s.conf.unset(key)
      import s.implicits._
      Seq(("admission", pricePruned > 0L, pricePruned < priceAll,
        prunedRows > 0, fullRefused))
        .toDF("check", "pruned_priced", "pruning_lowers_price",
          "pruned_admits", "full_refused")
    }))

  def oracle: Map[String, String] = Map(
    "q_catalog_extents" ->
      s"""SELECT 'orders' AS table_name,
         |  regexp_extract(file_name, '[^/]+$$') AS file_name,
         |  CAST(row_group_id AS BIGINT) AS row_group,
         |  path_in_schema AS column_name,
         |  CAST(type AS VARCHAR) AS physical_type,
         |  num_values,
         |  stats_null_count AS null_count,
         |  stats_min_value AS min_value,
         |  stats_max_value AS max_value,
         |  total_compressed_size AS compressed_bytes,
         |  total_uncompressed_size AS uncompressed_bytes
         |FROM parquet_metadata('$oracleSfDir/orders.parquet')
         |WHERE CAST(type AS VARCHAR) IN ('INT64','BYTE_ARRAY')
         |  AND path_in_schema IN (
         |    SELECT name FROM parquet_schema('$oracleSfDir/orders.parquet')
         |    WHERE num_children IS NULL
         |      AND (converted_type IS NULL
         |           OR CAST(converted_type AS VARCHAR) = 'UTF8'))
         |ORDER BY file_name, row_group, column_name""".stripMargin,

    "q_catalog_tables" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  COUNT(*) AS file_count,
         |  CAST(SUM(num_rows) AS BIGINT) AS n_rows,
         |  CAST(SUM(num_row_groups) AS BIGINT) AS row_groups
         |FROM parquet_file_metadata('$oracleSfDir/*.parquet')
         |GROUP BY 1 ORDER BY table_name""".stripMargin,

    "q_catalog_columns" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  name AS column_name,
         |  CAST(type AS VARCHAR) AS physical_type,
         |  COALESCE(CAST(converted_type AS VARCHAR), 'NONE') AS converted_type,
         |  CAST(repetition_type AS VARCHAR) AS repetition
         |FROM parquet_schema('$oracleSfDir/*.parquet')
         |WHERE regexp_extract(file_name, '([^/]+)[.]parquet$$', 1)
         |        IN ('orders','events','documents')
         |  AND num_children IS NULL
         |ORDER BY table_name, column_name""".stripMargin,

    // fixed-size tables → fixed scan_rows at every scale factor; the
    // volatile telemetry faces the gate as pinned booleans
    "q_catalog_querystats" ->
      """SELECT * FROM (VALUES
        |  ('qs_nation_count', CAST(25 AS BIGINT), TRUE, TRUE, FALSE, TRUE),
        |  ('qs_nation_group', CAST(25 AS BIGINT), TRUE, TRUE, TRUE, TRUE),
        |  ('qs_region_count', CAST(5 AS BIGINT), TRUE, TRUE, FALSE, TRUE))
        |  t(name, scan_rows, files_ok, bytes_ok, shuffled, ok)
        |ORDER BY name""".stripMargin,

    // ndv/min/max/nulls recomputed from the data; Spark collects no
    // min/max for strings → DESCRIBE renders 'NULL' (pinned)
    "q_catalog_analyze" ->
      """SELECT 'n_name' AS "column", CAST(count(DISTINCT n_name) AS BIGINT) AS ndv,
        |  'NULL' AS min_v, 'NULL' AS max_v,
        |  CAST(count(*) - count(n_name) AS BIGINT) AS nulls FROM nation
        |UNION ALL
        |SELECT 'n_nationkey', CAST(count(DISTINCT n_nationkey) AS BIGINT),
        |  CAST(min(n_nationkey) AS VARCHAR), CAST(max(n_nationkey) AS VARCHAR),
        |  CAST(count(*) - count(n_nationkey) AS BIGINT) FROM nation
        |UNION ALL
        |SELECT 'n_regionkey', CAST(count(DISTINCT n_regionkey) AS BIGINT),
        |  CAST(min(n_regionkey) AS VARCHAR), CAST(max(n_regionkey) AS VARCHAR),
        |  CAST(count(*) - count(n_regionkey) AS BIGINT) FROM nation
        |ORDER BY "column"""".stripMargin,

    // the join values recomputed from the raw tables; the plan-shape
    // guarantee (no exchange under bucketing) is pinned TRUE
    "q_layout_bucketjoin" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  TRUE AS join_shuffle_free
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // join values recomputed from the raw tables; the CBO reorder
    // proof is pinned TRUE
    "q_opt_joinreorder" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  TRUE AS dim_joined_early
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey = 0
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // join values recomputed from the raw tables; the bloom
    // injection proof is pinned TRUE
    "q_opt_bloomjoin" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
        |  TRUE AS bloom_injected
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // box agg recomputed over the raw table (layout-independent);
    // the multi-dim prune guarantee is pinned TRUE; band bounds are
    // the identical IEEE expression on both sides
    "q_layout_zorder" ->
      """WITH b AS (SELECT CAST(min(o_custkey) AS DOUBLE) AS cklo0,
        |    CAST(max(o_custkey) AS DOUBLE) AS ckhi0,
        |    min(o_totalprice) AS tplo0, max(o_totalprice) AS tphi0
        |  FROM orders),
        |r AS (SELECT cklo0 + 0.45 * (ckhi0 - cklo0) AS cklo,
        |    cklo0 + 0.55 * (ckhi0 - cklo0) AS ckhi,
        |    tplo0 + 0.45 * (tphi0 - tplo0) AS tplo,
        |    tplo0 + 0.55 * (tphi0 - tplo0) AS tphi FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
        |  TRUE AS pruned_both_dims
        |FROM orders, r
        |WHERE CAST(o_custkey AS DOUBLE) BETWEEN cklo AND ckhi
        |  AND o_totalprice BETWEEN tplo AND tphi""".stripMargin,

    // both evolution phases rebuilt from the raw tables
    "q_catalog_evolution" ->
      """WITH g1 AS (SELECT n_nationkey, n_name, CAST(NULL AS DOUBLE) AS score FROM nation),
        |g2 AS (SELECT r_regionkey + 100 AS n_nationkey, r_name AS n_name,
        |         r_regionkey * 1.5 AS score FROM region),
        |m AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
        |SELECT 'with_name' AS phase, n_nationkey, n_name, score FROM m
        |UNION ALL
        |SELECT 'dropped' AS phase, n_nationkey, CAST(NULL AS VARCHAR) AS n_name, score FROM m
        |ORDER BY phase, n_nationkey""".stripMargin,

    // phases recomputed from the raw table: disable hides region 2's
    // rows but keeps its dir; drop removes region 4's dir and rows
    "q_catalog_partition" ->
      """WITH r AS (SELECT count(*) AS total,
        |  count(*) FILTER (WHERE n_regionkey = 2) AS r2,
        |  count(*) FILTER (WHERE n_regionkey = 4) AS r4 FROM nation)
        |SELECT * FROM (
        |  SELECT 'p1_all' AS phase, CAST(5 AS BIGINT) AS part_dirs,
        |    total AS n_rows, r2 AS rows_r2, r4 AS rows_r4 FROM r
        |  UNION ALL SELECT 'p2_disabled2', 5, total - r2, 0, r4 FROM r
        |  UNION ALL SELECT 'p3_reenabled', 5, total, r2, r4 FROM r
        |  UNION ALL SELECT 'p4_dropped4', 4, total - r4, r2, 0 FROM r)
        |ORDER BY phase""".stripMargin,

    // the gate sees the admission DECISIONS (prices vary with sf)
    "q_catalog_governor" ->
      """SELECT 'admission' AS check, TRUE AS pruned_priced,
        |  TRUE AS pruning_lowers_price, TRUE AS pruned_admits,
        |  TRUE AS full_refused""".stripMargin,

    "q_catalog_files" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  regexp_extract(file_name, '[^/]+$$') AS file_name,
         |  CAST(num_row_groups AS BIGINT) AS row_groups,
         |  num_rows AS n_rows
         |FROM parquet_file_metadata('$oracleSfDir/*.parquet')
         |WHERE regexp_extract(file_name, '([^/]+)[.]parquet$$', 1)
         |        IN ('lineitem','orders','events')
         |ORDER BY table_name, file_name""".stripMargin)
}
