package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 scoring and an
  * inverted-index build — the lookup side of a training-data pipeline
  * (targeted corpus slicing, eval-set retrieval, data curation by
  * query). The reference engine serves this workload with its
  * dictionary scan + aggregation stack (`dbcon/joblist/
  * tupleaggregatestep.cpp`, pDictionaryScan); here both operators are
  * single exploded-token pipelines over partial-aggregable groupBys.
  *
  * Scale contract (100 TB corpus):
  *  - ONE tokenization scan feeds everything; term statistics are
  *    groupBys keyed by term/doc — all map-side combinable.
  *  - BM25's query-term filter hits BEFORE the tf groupBy, so the
  *    shuffled volume is only rows mentioning query terms; the df and
  *    global (N, avgdl) sides are bounded (|terms| rows and 1 row) and
  *    broadcast — the 1-row global join is a deliberate broadcast
  *    nested loop, the same bounded shape as q_sketch_approx.
  *  - The inverted index caps postings per term (`maxPostings`) and
  *    floors df (`minDf`): unbounded posting lists for stopword-class
  *    terms are the known skew trap of index builds at corpus scale.
  */
object Retrieval {

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * recipe): for each (query vector, positive id) pair, the top-k
    * nearest corpus vectors that are NOT the positive and NOT
    * near-duplicates of it (cosine ≥ `dupCeiling` to the query is
    * treated as "actually a positive" and excluded — the standard
    * false-negative guard). Composes the ANN stack: pass the brute
    * scorer for audit scale and swap `scored` for an LSH/IVF probe at
    * corpus scale — the mining logic (exclusions + rerank window) is
    * identical.
    *
    * Input `queries`: (qid, qvec, positive_id). Output: (qid,
    * vec_id, cosine, rank 1..k), rank on the 1e-6 grid with id
    * tie-break — reproducible cross-engine. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      dupCeiling: Double = 0.95,
      id: String = "vec_id", vec: String = "embedding",
      qid: String = "qid", qvec: String = "qvec",
      positive: String = "positive_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = AnnSearch.bruteForceTopK(
      corpus, queries.select(col(qid), col(qvec)),
      // +2: room for the excluded positive and one dup-ceiling hit
      k + 2, id, vec, qid, qvec)
    val pos = queries.select(col(qid), col(positive).as("_pos"))
    val w = Window.partitionBy(col(qid))
      .orderBy(round(col("cosine"), 6).desc, col("vec_id"))
    scored.join(broadcast(pos), Seq(qid))
      .where(col("vec_id") =!= col("_pos") && col("cosine") < dupCeiling)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qid), col("vec_id"), col("cosine"), col("rank"))
  }

  /** BM25 (Robertson/Spärck Jones; the Lucene `ln(1 + (N-df+.5)/(df+.5))`
    * idf variant, which keeps idf positive for df > N/2) of each
    * document against a bag of query `terms`; rows for documents
    * matching ≥ 1 term: (id, n_terms, bm25 rounded to 6 dp).
    *
    * The score is rounded to the 1e-6 grid BEFORE ranking so the
    * (bm25 DESC, id) order — and therefore any LIMIT a caller
    * applies — is reproducible cross-engine: with ≤ a handful of
    * summands the double error is ~1e-15, far inside the grid. */
  def bm25(docs: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id).as("_id"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))
    val dl = toks.groupBy(col("_id")).agg(count(lit(1)).as("_dl"))
    val g = dl.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
    val tf = toks.filter(col("_t").isin(terms: _*))
      .groupBy(col("_id"), col("_t")).agg(count(lit(1)).as("_tf"))
    val dfT = tf.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    // expression mirrors the oracle SQL token-for-token: double
    // arithmetic is not associative, so both engines must evaluate
    // the same tree to land on the same 1e-6 grid cell
    val termScore =
      log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))) *
        col("_tf") * lit(k1 + 1.0) /
        (col("_tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))
    tf.join(broadcast(dfT), "_t")
      .join(dl, "_id")
      .crossJoin(broadcast(g))
      .groupBy(col("_id"))
      .agg(round(sum(termScore), 6).as("bm25"), count(lit(1)).as("n_terms"))
      .select(col("_id").as(id), col("n_terms"), col("bm25"))
  }

  /** Top-`k` BM25 hits, ranked (bm25 DESC, id) on the rounded grid. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame =
    bm25(docs, terms, k1, b, id, text)
      .orderBy(col("bm25").desc, col(id))
      .limit(k)

  /** Inverted index: one row per term with df (documents containing
    * it), cf (total occurrences), and the first `maxPostings` doc ids
    * ascending, comma-joined. Terms below `minDf` are dropped — at
    * corpus scale the df floor is what keeps the index output
    * proportional to the VOCABULARY head rather than the corpus, and
    * the postings cap bounds the one per-term row. Postings are
    * sorted+sliced per term (array ops after a collect_list of at
    * most the per-term match set); a production variant would
    * delta-encode, but the shape — groupBy(term, doc) → groupBy(term)
    * — is the scalable one either way. */
  def invertedIndex(docs: DataFrame, minDf: Long = 1, maxPostings: Int = 10,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id).as("_id"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))
    toks.groupBy(col("_t"), col("_id")).agg(count(lit(1)).as("_tf"))
      .groupBy(col("_t")).agg(
        count(lit(1)).as("df"),
        sum(col("_tf")).as("cf"),
        array_join(slice(array_sort(collect_list(col("_id"))), 1, maxPostings), ",")
          .as("postings"))
      .filter(col("df") >= minDf)
      .select(col("_t").as("term"), col("df"), col("cf"), col("postings"))
  }

  /** Distinctive-term tf-cosine similarity join: document pairs whose
    * cosine over RAW term frequencies — restricted to terms with
    * df ≤ `maxDf` — reaches `threshold`. The sparse-vector sibling of
    * the embedding-cosine dedup (`AnnSearch`): same join topology as
    * a PPJoin candidate stage, but the score is the full cosine, not
    * Jaccard.
    *
    * Exactness: the df cap is a SEMANTIC (stopword-stripped cosine, à
    * la SemHash's idf cut), not an approximation of something else —
    * the oracle replays it verbatim. Dot products and norms are
    * INTEGER sums (associative ⇒ partitioning-independent); the only
    * float math is one sqrt+divide per surviving pair, rounded to the
    * 1e-6 grid both engines share.
    *
    * Scale shape: the term self-join is the inverted-index join —
    * Σ_kept df(t)² pairs, with the df cap cutting off exactly the
    * stopword classes that would make it quadratic (the same bound
    * SSJoin literature applies); norms ride a second |docs|-row join.
    * Nothing is all-pairs, nothing collects. */
  def tfCosinePairs(docs: DataFrame, threshold: Double, maxDf: Long = 50,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tf = docs.select(col(id).as("_id"),
        explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))
      .groupBy(col("_id"), col("_t")).agg(count(lit(1)).as("_tf"))
    val kept = tf.join(
      tf.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf).select(col("_t")), "_t")
    val norms = kept.groupBy(col("_id"))
      .agg(sum(col("_tf") * col("_tf")).as("_n2"))
    val a = kept.select(col("_t"), col("_id").as("id_a"), col("_tf").as("_tfa"))
    val b = kept.select(col("_t"), col("_id").as("id_b"), col("_tf").as("_tfb"))
    a.join(b, Seq("_t")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("_tfa") * col("_tfb")).as("_dot"))
      .join(norms.select(col("_id").as("id_a"), col("_n2").as("_na")), "id_a")
      .join(norms.select(col("_id").as("id_b"), col("_n2").as("_nb")), "id_b")
      .withColumn("cosine", round(col("_dot") /
        sqrt(col("_na").cast("double") * col("_nb").cast("double")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
