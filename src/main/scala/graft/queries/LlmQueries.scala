package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{AnnSearch, Dedup, Multimodal, TextAnalysis}

/** The LLM-training-data pipeline suite over the driver-provided
  * `documents` and `embeddings` tables: text analysis, exact and
  * near-duplicate detection, ANN search, multimodal plumbing.
  *
  * Oracle-checked where DuckDB can express identical semantics
  * (integer text statistics, md5 exact-dedup, brute-force cosine
  * top-k — DuckDB's list_cosine_similarity over DOUBLE[] is
  * bit-identical to our zip_with/aggregate fold, verified — and
  * frame-sampling arithmetic). The hash-based operators (MinHash,
  * SimHash, xxhash fingerprints, LSH buckets) use Spark's hash
  * family, which DuckDB does not implement → rows-only entries whose
  * semantics are asserted by the ScalaTest specs (planted
  * near-duplicates found, LSH recall vs brute force, etc).
  */
object LlmQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    // ---- text analysis (oracle: integer stats only — ratio rounding
    // is engine-dependent at ties; ratios are spec-tested) ----
    "q_text_stats" -> ((s, dir) => {
      // explode → one codegen'd aggregation (the row-pipeline shape;
      // per-row array HOFs are interpreted and ~3× slower here)
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("_t"))
      val stats = toks.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("_t")).as("n_distinct"),
        sum(when(col("_t").isin(TextAnalysis.EnStopwords: _*), 1L).otherwise(0L))
          .as("n_stopwords"),
        sum(length(col("_t")).cast("long")).as("sum_token_len"))
      docs.select(col("doc_id"), length(col("text")).cast("bigint").as("n_chars"))
        .join(stats, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          col("n_chars"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          coalesce(col("n_stopwords"), lit(0L)).as("n_stopwords"),
          coalesce(col("sum_token_len"), lit(0L)).as("sum_token_len"))
        .orderBy(col("doc_id"))
    }),
    "q_text_lang" -> ((s, dir) => {
      // rows-only: langid/quality/fingerprint use heuristics + xxhash.
      // One-pass profile (single tokenization) + per-row fingerprint.
      val docs = t(s, dir, "documents")
      TextAnalysis.profiles(docs)
        .join(docs.select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens")), "doc_id")
        .select(col("doc_id"), col("lang_pred"), col("quality"),
          col("fingerprint"), col("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup ----
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"))
        .orderBy(col("content_hash"))
    }),
    "q_dedup_minhash" -> ((s, dir) => {
      // rows-only: murmur-based MinHash-LSH; spec asserts the planted
      // near-dup pairs are exactly the ≥0.6-Jaccard population
      Dedup.minhashDupPairs(t(s, dir, "documents"), threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashDupPairs(t(s, dir, "documents"), maxDist = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_dedup_cosine" -> ((s, dir) => {
      AnnSearch.cosineDupPairs(t(s, dir, "embeddings"), threshold = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity search ----
    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      AnnSearch.bruteForceTopK(emb, queries, k = 10)
        .select(col("qid"), col("vec_id"), col("cosine"), col("rank").cast("int").as("rnk"))
        .drop("rank")
        .orderBy(col("qid"), col("rnk"))
    }),
    "q_ann_lsh" -> ((s, dir) => {
      // rows-only: bucketed ANN; spec asserts recall vs brute force
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      AnnSearch.lshTopK(emb, queries, k = 10)
        .select(col("qid"), col("vec_id"), col("cosine"), col("rank").cast("int").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    "q_ann_ivf" -> ((s, dir) => {
      // rows-only: IVF cell-probe ANN; spec asserts recall
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.llm.AnnSearch.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 6)
        .select(col("qid"), col("vec_id"), col("cosine"), col("rank").cast("int").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // ---- multimodal ----
    "q_mm_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(Multimodal.attachPayload(t(s, dir, "documents")), step = 5)
        .select(col("doc_id"), col("n_frames").cast("int").as("n_frames"),
          col("frame_idx").cast("int").as("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
    "q_mm_features" -> ((s, dir) => {
      // rows-only: partition-batch feature kernel over binary payloads
      Multimodal.extractFeatures(s, Multimodal.attachPayload(t(s, dir, "documents")))
        .toDF()
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','this','was','for','on','are','as','with','at','be'], x))) AS BIGINT) AS n_stopwords,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_token_len
        |FROM (SELECT doc_id, text,
        |        list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "q_ann_brute" ->
      """SELECT qid, vec_id, cosine, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |    list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, c.vec_id) AS rnk
        |  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q) t
        |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx
        |FROM (SELECT doc_id, CAST(doc_id % 30 + 1 AS INT) AS n_frames,
        |        unnest(range(0, doc_id % 30 + 1, 5)) AS f
        |      FROM documents WHERE doc_id % 4 = 3)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
