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
    time("jaccard_full") { noop(Dedup.jaccardDupPairs(docs, threshold = 0.6)) }
    time("jaccard_candidates") {
      Dedup.jaccardCandidateCount(docs, 0.6)
    }
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
