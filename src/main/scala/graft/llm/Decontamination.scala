package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass that
  * removes corpus documents overlapping an evaluation set (the n-gram
  * collision rule of public LLM training reports). Overlap is counted
  * in DISTINCT word n-grams shared with ANY benchmark example, via
  * the same `shingle_set` kernel as the dedup family.
  *
  * Scale shape: benchmark sets are small (thousands of examples ⇒ at
  * most a few million distinct shingles), so the benchmark side is
  * collected into a broadcast hash join build — the 100 TB corpus is
  * scanned ONCE, never shuffled by shingle; the only shuffle is the
  * partial-aggregable per-doc hit count (≤ one row per contaminated
  * doc after map-side combine). Compare: shuffling the corpus shingle
  * rows against the benchmark would move ~|corpus|·|shingles/doc|
  * rows — the broadcast plan moves none of them.
  */
object Decontamination {

  /** Distinct word-`shingleN`-gram shingles of the benchmark set, one
    * row per shingle. */
  def benchShingles(bench: DataFrame, text: String = "text",
      shingleN: Int = 3): DataFrame =
    bench
      .select(explode(call_function("shingle_set", col(text), lit(shingleN))).as("_ng"))
      .distinct()

  /** (id, n_hits) per corpus document: the number of distinct
    * shingles the doc shares with the benchmark. Docs with zero
    * overlap are absent (inner join). */
  def contaminationScores(docs: DataFrame, bench: DataFrame,
      id: String = "doc_id", text: String = "text",
      shingleN: Int = 3): DataFrame = {
    // shingle_set emits each doc's DISTINCT shingles, so count(*)
    // after the join is exactly |doc-shingles ∩ bench-shingles|
    val sh = docs.select(col(id),
      explode(call_function("shingle_set", col(text), lit(shingleN))).as("_ng"))
    sh.join(broadcast(benchShingles(bench, text, shingleN)), "_ng")
      .groupBy(col(id)).agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus minus every document sharing ≥ `minHits` distinct
    * shingles with the benchmark. */
  def decontaminate(docs: DataFrame, bench: DataFrame, minHits: Long = 1,
      id: String = "doc_id", text: String = "text",
      shingleN: Int = 3): DataFrame = {
    val bad = contaminationScores(docs, bench, id, text, shingleN)
      .filter(col("n_hits") >= minHits).select(col(id))
    docs.join(bad, Seq(id), "left_anti")
  }

  /** Bloom-filter decontamination — the broadcast-PROBE scale path.
    * [[decontaminate]] broadcasts the benchmark's distinct shingle
    * STRINGS (fine at thousands of examples, but a full eval-suite
    * union can reach GBs of shingle text); this variant compresses
    * the membership set into a bloom filter (~1.4 bytes/element/ln(1/fpp)
    * — single-digit MBs for millions of shingles at fpp 1e-8), built
    * DISTRIBUTED by `DataFrameStatFunctions.bloomFilter` (per-partition
    * build, driver OR-merge), then probed inside the corpus scan with
    * ZERO joins and ZERO shuffle before the final anti-filter.
    *
    * Direction of error is SAFE for hygiene: a false positive can only
    * OVERCOUNT a doc's hits (dropping a clean doc with probability
    * ≈ shingles·fpp), never keep a contaminated one —
    * bloomed-clean ⊆ exactly-clean (LlmSpec asserts both containment
    * and, at fpp 1e-8, equality). The probe closure is a scala UDF:
    * Spark exposes no public bloom-probe Column function, and the
    * probe is a few ns against a broadcast bitset — not a codegen
    * bottleneck at any scale. */
  def decontaminateBloom(docs: DataFrame, bench: DataFrame, minHits: Long = 1,
      id: String = "doc_id", text: String = "text", shingleN: Int = 3,
      fpp: Double = 1e-8): DataFrame = {
    val shingles = benchShingles(bench, text, shingleN)
    // the count is a metadata-sized action on the SMALL bench side —
    // the bloom sizing needs the true element count
    val n = math.max(shingles.count(), 1L)
    val bloom = shingles.stat.bloomFilter("_ng", n, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val hits = udf { (ngs: Seq[String]) =>
      if (ngs == null) 0L else ngs.count(bc.value.mightContainString).toLong
    }
    docs.filter(
      hits(call_function("shingle_set", col(text), lit(shingleN))) < minHits)
  }

  /** SEMANTIC contamination scores — the embedding-space complement
    * of the n-gram rule: (id, n_hits, max_cos) per corpus item whose
    * embedding lies within cosine ≥ `threshold` of ANY benchmark
    * embedding (catches paraphrases and translations the verbatim
    * shingle rule misses; both rules together are the published
    * two-layer decontamination recipe). Same scale contract as the
    * text rule: eval sets are small, so the benchmark side broadcasts
    * and the 100 TB corpus is scanned ONCE — one codegen'd `vec_dot`
    * per (row, bench-vector), no shuffle before the partial-aggregable
    * per-id count/max. No LSH needed at any corpus scale because the
    * pair count is |corpus|·|bench| with |bench| bounded. */
  def semanticScores(corpus: DataFrame, bench: DataFrame, threshold: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val c = corpus.select(col(id), col(vec).cast(ArrayType(DoubleType)).as("_cv"))
    val b = bench.select(col(vec).cast(ArrayType(DoubleType)).as("_bv"))
    c.crossJoin(broadcast(b))
      .select(col(id), AnnSearch.cosine(col("_cv"), col("_bv")).as("_cos"))
      .filter(col("_cos") >= threshold)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"), max(col("_cos")).as("max_cos"))
  }

  /** Corpus minus every item semantically contaminated vs the
    * benchmark (max bench-cosine ≥ `threshold`). */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame, threshold: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    corpus.join(semanticScores(corpus, bench, threshold, id, vec).select(col(id)),
      Seq(id), "left_anti")
}
