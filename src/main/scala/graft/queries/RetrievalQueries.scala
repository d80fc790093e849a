package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, LanguageModel, Retrieval, TextAnalysis}

/** Retrieval + corpus-LM operators: BM25 scoring, inverted-index
  * build, unigram cross-entropy (the perplexity-filter stand-in),
  * DSIR importance weights, and line-granular exact substring dedup.
  *
  * Oracle notes: every float here is ln()-based on the round-6 grid
  * (the parity q_fn_math pins); every ordering is on the ROUNDED
  * value with an id tie-break, so top-k cuts are cross-engine
  * deterministic. The corpus is single-line word soup, so the
  * substring-dedup entry synthesizes deterministic 8-token lines
  * first (the same corpus-adaptation pattern q_redact uses for PII)
  * — near-dup documents then genuinely share lines.
  */
object RetrievalQueries {
  import Q._

  /** Deterministic 8-token line structure over the word-soup corpus:
    * tokens 0..7 become line 0, 8..15 line 1, ... joined with \n. */
  private def lined: Column = {
    val ts = TextAnalysis.tokens(lower(col("text")))
    when(size(ts) === 0, lit("")).otherwise(
      array_join(
        transform(sequence(lit(0), ceil(size(ts) / 8.0).cast("int") - 1),
          g => concat_ws(" ", slice(ts, g * 8 + 1, lit(8)))),
        "\n"))
  }

  /** The same 8-token line synthesis in DuckDB. */
  private val linedSql =
    """CASE WHEN len(ts) = 0 THEN '' ELSE array_to_string(
      |  list_transform(range(0, CAST(ceil(len(ts) / 8.0) AS BIGINT)),
      |    g -> array_to_string(ts[g*8+1 : g*8+8], ' ')), chr(10)) END""".stripMargin

  private val toksSql =
    """list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> length(x) > 0)"""

  /** Case-preserving tokenizer — span dedup matches substrings
    * EXACTLY (case folding would merge spans the cut step must treat
    * as distinct), unlike the LM family's lowercased statistics. */
  private val toksRawSql =
    """list_filter(string_split_regex(text, '[ \t\n\f\r]+'), x -> length(x) > 0)"""

  val queries: Map[String, QFn] = Map(
    "q_bm25_topk" -> ((s, dir) => {
      Retrieval.bm25TopK(t(s, dir, "documents"),
        terms = Seq("spark", "shuffle", "fast"), k = 20)
    }),
    "q_hybrid_rrf" -> ((s, dir) => {
      // Hybrid retrieval with reciprocal-rank fusion — the modern
      // lexical+semantic search standard: BM25 ranks fuse with
      // query-by-example embedding-cosine ranks as Σ 1/(60+rank),
      // absent-ranker contributes 0. Both rank lists cut at 50 on the
      // ROUNDED-grid order with id tie-breaks; the fusion sum is two
      // fixed-order double terms — cross-engine deterministic end to
      // end. Each rank list is cut by orderBy+LIMIT FIRST (plans as
      // TakeOrderedAndProject — distributed partial top-k, no corpus
      // sort) and only the surviving 50-row frame gets its row_number
      // window: the one global window in this plan runs over a
      // constant-bounded frame (allowlisted in PlanGuardSpec).
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val lex = Retrieval.bm25(docs, terms = Seq("spark", "shuffle", "fast"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(col("doc_id"), col("lex_rank"))
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))
      val sem = emb.join(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(graft.llm.AnnSearch.cosine(col("v"), col("qv")), 6).as("cos"))
        .filter(col("doc_id") =!= 0)
        .orderBy(col("cos").desc, col("doc_id")).limit(50)
        .withColumn("sem_rank", row_number().over(
          Window.orderBy(col("cos").desc, col("doc_id"))))
        .select(col("doc_id"), col("sem_rank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (col("lex_rank") + 60), lit(0.0))
            + coalesce(lit(1.0) / (col("sem_rank") + 60), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
    }),
    "q_tfidf_pairs" -> ((s, dir) => {
      // distinctive-term tf-cosine similarity join (sparse-vector
      // sibling of the embedding-cosine dedup): integer dot/norms,
      // one float sqrt+divide per surviving pair on the 1e-6 grid
      Retrieval.tfCosinePairs(t(s, dir, "documents"), threshold = 0.4, maxDf = 50)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_inverted_index" -> ((s, dir) => {
      Retrieval.invertedIndex(t(s, dir, "documents"), minDf = 50, maxPostings = 10)
        .orderBy(col("term"))
    }),
    "q_lm_entropy" -> ((s, dir) => {
      LanguageModel.crossEntropy(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "q_ccnet_buckets" -> ((s, dir) => {
      // CCNet-style perplexity bucketing: per-doc LM cross-entropy →
      // head/middle/tail terciles → per-bucket audit rollup (the
      // bucket-then-sample hygiene recipe of the CCNet pipeline).
      // Terciles come from broadcast percentile THRESHOLDS — one
      // aggregate row, bucket by comparison; no global window (the
      // r12 scale-killer was an ntile over the docs-sized CE frame).
      // exact=true: percentile_disc cut points the DuckDB oracle
      // replays value-for-value (quantile_disc, same ceil(p·n)-rank
      // definition — pinned in RetrievalSpec); the operator DEFAULT
      // is the approx_percentile sketch, same plan shape.
      LanguageModel.perplexityBuckets(t(s, dir, "documents"), exact = true)
        .groupBy(col("bucket")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("xent")).as("min_xent"),
          max(col("xent")).as("max_xent"))
        .orderBy(col("bucket"))
    }),
    "q_importance_weights" -> ((s, dir) => {
      LanguageModel.importanceWeights(t(s, dir, "documents"),
          targetPred = col("source") === "src0")
        .orderBy(col("doc_id"))
    }),
    "q_source_kl" -> ((s, dir) => {
      LanguageModel.sourceDivergence(t(s, dir, "documents"))
        .orderBy(col("source"))
    }),
    "q_vocab_top" -> ((s, dir) => {
      LanguageModel.vocabulary(t(s, dir, "documents"), size = 20)
        .orderBy(col("cnt").desc, col("term"))
    }),
    "q_vocab_oov" -> ((s, dir) => {
      LanguageModel.oovProfile(t(s, dir, "documents"), vocabSize = 20)
        .orderBy(col("doc_id"))
    }),
    "q_lm_bigram" -> ((s, dir) => {
      LanguageModel.bigramCrossEntropy(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "q_lm_trigram" -> ((s, dir) => {
      LanguageModel.trigramCrossEntropy(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "q_lm_kneser_ney" -> ((s, dir) => {
      LanguageModel.kneserNeyCrossEntropy(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "q_dedup_lines" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), lined.as("text"))
      Dedup.dedupLines(docs)
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),
    "q_dedup_spans" -> ((s, dir) => {
      // sliding 8-token-window duplicated-span profile (Lee et al.
      // fixed-window tier); raw case — see toksRawSql
      Dedup.spanProfile(t(s, dir, "documents"), windowTokens = 8)
        .orderBy(col("doc_id"))
    }),
    "q_dedup_span_runs" -> ((s, dir) => {
      // maximal duplicated runs (interval-union token accounting) —
      // the cut list the span profile only counts
      Dedup.spanRuns(t(s, dir, "documents"), windowTokens = 8)
        .orderBy(col("doc_id"))
    }),
    "q_dedup_cut" -> ((s, dir) => {
      // APPLY the substring dedup: cut every duplicated window except
      // its global first occurrence, rebuild (space-joined)
      Dedup.cutDupSpans(t(s, dir, "documents"), windowTokens = 8)
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("n_cut"))
        .orderBy(col("doc_id"))
    }),
    "q_unigram_greedy" -> ((s, dir) => {
      // Greedy longest-match piece segmentation (the SQL-replayable
      // mode of the unigram tokenizer; the Viterbi decode is
      // spec-verified against exhaustive argmax in RetrievalSpec).
      // DuckDB replays the identical longest-match walk as a
      // single-path recursive CTE with a LATERAL best-piece probe.
      import graft.llm.LanguageModel
      val vocab = (("abcdefghijklmnopqrstuvwxyz_".map(_.toString)) ++
        Seq("the", "merge", "batch", "join", "sort", "data", "key", "row"))
        .map(p => p -> 0.0).toMap
      LanguageModel.unigramSegment(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          vocab, greedy = true, maxLen = 24)
        .orderBy(col("doc_id"))
    }),
    "q_bpe_pairs" -> ((s, dir) => {
      // round-1 BPE pair statistics — the oracle-checked slice of the
      // training loop (the full loop below is iterative-greedy, not
      // SQL-expressible)
      LanguageModel.bpePairStats(t(s, dir, "documents"))
        .orderBy(col("freq").desc, col("left"), col("right")).limit(30)
    }),
    "q_bpe_merges" -> ((s, dir) => {
      // Property-oracled (was rows-only) full merge-table induction.
      // The loop is iterative-greedy, but two exact invariants are
      // SQL-checkable: (a) the rank-1 merge IS the global argmax of
      // the round-1 pair statistics (DuckDB recomputes those — the
      // q_bpe_pairs logic — and its (freq DESC, l, r) head must equal
      // the engine's first merge, emitted as value columns); (b) the
      // chosen frequency is non-increasing in rank — any pair a merge
      // CREATES involves the new symbol and occurs at most freq(max)
      // times, and no existing pair ever gains occurrences, so the
      // greedy max can only fall. Deterministic tie-breaks; the full
      // merge table stays pinned in RetrievalSpec (Sennrich example,
      // overlap greed, exhaustion).
      import org.apache.spark.sql.expressions.Window
      val m = LanguageModel.bpeMerges(t(s, dir, "documents"), numMerges = 10)
      val w = Window.orderBy(col("rank"))
      m.select(col("rank"),
          when(col("rank") === 1, col("left")).as("left1"),
          when(col("rank") === 1, col("right")).as("right1"),
          when(col("rank") === 1, col("freq")).as("freq1"),
          (col("freq") <= coalesce(lag(col("freq"), 1).over(w), col("freq")))
            .as("monotone_ok"),
          (col("freq") > 0).as("freq_pos"))
        .orderBy(col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_unigram_greedy" ->
      ("""WITH RECURSIVE vocab(piece) AS (
        |  SELECT unnest(['the','merge','batch','join','sort','data','key','row',""" +
        "'a','b','c','d','e','f','g','h','i','j','k','l','m','n','o','p','q','r'," +
        "'s','t','u','v','w','x','y','z','_'])" + """),
        |d AS (SELECT doc_id, substring(replace(lower(text), ' ', '_'), 1, 24) AS s
        |      FROM documents WHERE doc_id < 300),
        |seg AS (
        |  SELECT doc_id, s, 0 AS pos, '' AS pieces, 0 AS n FROM d
        |  UNION ALL
        |  SELECT seg.doc_id, seg.s, seg.pos + len(b.piece),
        |    CASE WHEN seg.n = 0 THEN b.piece
        |         ELSE seg.pieces || '|' || b.piece END,
        |    seg.n + 1
        |  FROM seg, LATERAL (
        |    SELECT piece FROM vocab
        |    WHERE substring(seg.s, seg.pos + 1, len(piece)) = piece
        |    ORDER BY len(piece) DESC, piece LIMIT 1) b
        |  WHERE seg.pos < len(seg.s))
        |SELECT doc_id, pieces, CAST(n AS INT) AS n_pieces FROM seg
        |WHERE pos = len(s) ORDER BY doc_id""").stripMargin,
    "q_bm25_topk" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |g AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
        |       WHERE t IN ('spark', 'shuffle', 'fast') GROUP BY doc_id, t),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |sc AS (
        |  SELECT tf.doc_id,
        |    round(sum(ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))), 6) AS bm25,
        |    count(*) AS n_terms
        |  FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN g
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, n_terms, bm25 FROM sc
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |g AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
        |       WHERE t IN ('spark', 'shuffle', 'fast') GROUP BY doc_id, t),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |sc AS (
        |  SELECT tf.doc_id,
        |    round(sum(ln(1.0 + (g.n - df.df + 0.5) / (df.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))), 6) AS bm25
        |  FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN g
        |  GROUP BY tf.doc_id),
        |lexf AS (SELECT doc_id, CAST(lex_rank AS INT) AS lex_rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        |  FROM sc) WHERE lex_rank <= 50),
        |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |qv AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        |semsc AS (SELECT vec_id AS doc_id,
        |  round(least(greatest(CASE WHEN dn > 0 THEN ip / dn ELSE 0.0 END, -1.0), 1.0), 6) AS cos
        |  FROM (SELECT e.vec_id, list_inner_product(e.v, q.qv) AS ip,
        |          sqrt(list_inner_product(e.v, e.v)) * sqrt(list_inner_product(q.qv, q.qv)) AS dn
        |        FROM emb e CROSS JOIN qv q)
        |  WHERE vec_id <> 0),
        |semf AS (SELECT doc_id, CAST(sem_rank AS INT) AS sem_rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
        |  FROM semsc) WHERE sem_rank <= 50)
        |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
        |  round(COALESCE(CAST(1.0 AS DOUBLE) / (l.lex_rank + 60), 0.0)
        |    + COALESCE(CAST(1.0 AS DOUBLE) / (s.sem_rank + 60), 0.0), 6) AS rrf
        |FROM lexf l FULL OUTER JOIN semf s ON l.doc_id = s.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_tfidf_pairs" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY doc_id, t),
        |kept AS (SELECT tf.* FROM tf
        |         JOIN (SELECT t FROM tf GROUP BY t HAVING count(*) <= 50) d USING (t)),
        |nrm AS (SELECT doc_id, sum(tf * tf) AS n2 FROM kept GROUP BY doc_id),
        |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.tf * b.tf) AS dot
        |         FROM kept a JOIN kept b ON a.t = b.t AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2),
        |sc AS (SELECT id_a, id_b,
        |         round(dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cosine
        |       FROM dots JOIN nrm na ON dots.id_a = na.doc_id
        |                 JOIN nrm nb ON dots.id_b = nb.doc_id)
        |SELECT id_a, id_b, cosine FROM sc WHERE cosine >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_inverted_index" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |tf AS (SELECT t, doc_id, count(*) AS tf FROM toks GROUP BY t, doc_id)
        |SELECT t AS term, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS cf,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings
        |FROM tf GROUP BY t HAVING count(*) >= 50 ORDER BY term""".stripMargin,
    "q_lm_entropy" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |cnt AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        |tot AS (SELECT sum(c) AS total FROM cnt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(ln(tot.total) - sum(ln(cnt.c)) / count(*), 6) AS xent
        |FROM toks JOIN cnt USING (t) CROSS JOIN tot
        |GROUP BY doc_id, tot.total ORDER BY doc_id""".stripMargin,
    "q_ccnet_buckets" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |cnt AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        |tot AS (SELECT sum(c) AS total FROM cnt),
        |ce AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    round(ln(tot.total) - sum(ln(cnt.c)) / count(*), 6) AS xent
        |  FROM toks JOIN cnt USING (t) CROSS JOIN tot
        |  GROUP BY doc_id, tot.total),
        |th AS (SELECT quantile_disc(xent, CAST(1 AS DOUBLE)/3) AS t1,
        |              quantile_disc(xent, CAST(2 AS DOUBLE)/3) AS t2 FROM ce),
        |b AS (SELECT n_tokens, xent,
        |        CASE WHEN xent <= th.t1 THEN 'head'
        |             WHEN xent <= th.t2 THEN 'middle'
        |             ELSE 'tail' END AS bucket
        |      FROM ce CROSS JOIN th)
        |SELECT bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(xent) AS min_xent, max(xent) AS max_xent
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_importance_weights" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source = 'src0' AS tgt, unnest($toksSql) AS t FROM documents),
        |v AS (SELECT t, count(*) AS cr,
        |        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        |      FROM toks GROUP BY t),
        |g AS (SELECT sum(cr) AS totr, sum(ct) AS tott, count(*) AS vocab FROM v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(sum(ln((v.ct + 1.0) / (g.tott + g.vocab))
        |          - ln((v.cr + 1.0) / (g.totr + g.vocab))) / count(*), 6) AS logw
        |FROM toks JOIN v USING (t) CROSS JOIN g
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab_top" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents)
        |SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
        |FROM toks GROUP BY t ORDER BY cnt DESC, term LIMIT 20""".stripMargin,
    "q_vocab_oov" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
        |voc AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t
        |        ORDER BY cnt DESC, t LIMIT 20)
        |SELECT d.doc_id,
        |  CAST(coalesce(count(toks.t), 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(CASE WHEN voc.t IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_oov
        |FROM documents d
        |LEFT JOIN toks ON d.doc_id = toks.doc_id
        |LEFT JOIN voc ON toks.t = voc.t
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_lm_kneser_ney" ->
      s"""WITH base AS (
        |  SELECT doc_id, $toksSql AS ts FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |    i -> {'p': ts[i], 'c': ts[i+1]})) AS b
        |  FROM base WHERE len(ts) >= 2),
        |bf AS (SELECT doc_id, b.p AS p, b.c AS c FROM bi),
        |c2 AS (SELECT p, c, count(*) AS cb FROM bf GROUP BY p, c),
        |byp AS (SELECT p, sum(cb) AS cp, count(*) AS n1p FROM c2 GROUP BY p),
        |byc AS (SELECT c, count(*) AS n1c FROM c2 GROUP BY c),
        |bt AS (SELECT count(*) AS bt FROM c2)
        |SELECT bf.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(-sum(ln((greatest(c2.cb - 0.75, 0.0)
        |    + 0.75 * byp.n1p * byc.n1c / bt.bt) / byp.cp)) / count(*), 6)
        |    AS xent_kn
        |FROM bf JOIN c2 USING (p, c) JOIN byp USING (p) JOIN byc USING (c)
        |CROSS JOIN bt
        |GROUP BY bf.doc_id ORDER BY bf.doc_id""".stripMargin,
    "q_lm_bigram" ->
      s"""WITH base AS (
        |  SELECT doc_id, $toksSql AS ts FROM documents),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |    i -> {'p': ts[i], 'c': ts[i+1]})) AS b
        |  FROM base WHERE len(ts) >= 2),
        |bf AS (SELECT doc_id, b.p AS p, b.c AS c FROM bi),
        |cb AS (SELECT p, c, count(*) AS cb FROM bf GROUP BY p, c),
        |toks AS (SELECT doc_id, unnest(ts) AS t FROM base),
        |cu AS (SELECT t, count(*) AS cu FROM toks GROUP BY t),
        |v AS (SELECT count(*) AS v FROM cu)
        |SELECT bf.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(sum(ln(cu.cu + v.v) - ln(cb.cb + 1.0)) / count(*), 6) AS xent_bi
        |FROM bf JOIN cb USING (p, c) JOIN cu ON bf.p = cu.t CROSS JOIN v
        |GROUP BY bf.doc_id ORDER BY bf.doc_id""".stripMargin,
    // count CTEs are MATERIALIZED: without it DuckDB re-inlines each
    // c2/cu reference back to its explode chain and the join-order
    // search over the inlined tree goes pathological (minutes at
    // sf0.001; 0.85 s materialized — measured)
    "q_lm_trigram" ->
      s"""WITH base AS MATERIALIZED (
        |  SELECT doc_id, $toksSql AS ts FROM documents),
        |tri AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
        |    i -> {'a': ts[i], 'b': ts[i+1], 'c': ts[i+2]})) AS g
        |  FROM base WHERE len(ts) >= 3),
        |tf AS MATERIALIZED (SELECT doc_id, g.a AS a, g.b AS b, g.c AS c FROM tri),
        |c3 AS MATERIALIZED (SELECT a, b, c, count(*) AS c3 FROM tf GROUP BY a, b, c),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(ts)),
        |    i -> {'p': ts[i], 'q': ts[i+1]})) AS g
        |  FROM base WHERE len(ts) >= 2),
        |bf AS (SELECT g.p AS p, g.q AS q FROM bi),
        |c2 AS MATERIALIZED (SELECT p, q, count(*) AS c2 FROM bf GROUP BY p, q),
        |toks AS (SELECT unnest(ts) AS t FROM base),
        |cu AS MATERIALIZED (SELECT t, count(*) AS cu FROM toks GROUP BY t),
        |nv AS MATERIALIZED (SELECT sum(cu) AS n, count(*) AS v FROM cu)
        |SELECT tf.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  round(-sum(ln(0.6 * c3.c3 / cab.c2 + 0.3 * cbc.c2 / cb.cu
        |    + 0.1 * (cuc.cu + 1.0) / (nv.n + nv.v))) / count(*), 6) AS xent_tri
        |FROM tf
        |JOIN c3 USING (a, b, c)
        |JOIN c2 cab ON tf.a = cab.p AND tf.b = cab.q
        |JOIN c2 cbc ON tf.b = cbc.p AND tf.c = cbc.q
        |JOIN cu cb ON tf.b = cb.t
        |JOIN cu cuc ON tf.c = cuc.t
        |CROSS JOIN nv
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q_source_kl" ->
      s"""WITH toks AS (
        |  SELECT source, unnest($toksSql) AS t FROM documents),
        |st AS (SELECT source, t, count(*) AS cst FROM toks GROUP BY source, t),
        |ct AS (SELECT t, sum(cst) AS ctt FROM st GROUP BY t),
        |ns AS (SELECT source, sum(cst) AS ns FROM st GROUP BY source),
        |g AS (SELECT sum(ctt) AS n FROM ct)
        |SELECT st.source, CAST(ns.ns AS BIGINT) AS n_tokens,
        |  round(sum((st.cst / ns.ns) * ln((st.cst / ns.ns) / (ct.ctt / g.n))), 6) AS kl
        |FROM st JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN g
        |GROUP BY st.source, ns.ns ORDER BY st.source""".stripMargin,
    "q_dedup_lines" ->
      s"""WITH base AS (
        |  SELECT doc_id, $toksSql AS ts FROM documents),
        |docs2 AS (SELECT doc_id, $linedSql AS txt FROM base),
        |flat AS (
        |  SELECT doc_id, unnest(string_split(txt, chr(10))) AS l,
        |    generate_subscripts(string_split(txt, chr(10)), 1) - 1 AS p
        |  FROM docs2),
        |ranked AS (
        |  SELECT doc_id, p, l,
        |    row_number() OVER (PARTITION BY l ORDER BY doc_id, p) AS rn
        |  FROM flat WHERE length(l) > 0),
        |keptl AS (
        |  SELECT doc_id, p, l FROM ranked WHERE rn = 1
        |  UNION ALL SELECT doc_id, p, l FROM flat WHERE length(l) = 0),
        |kept AS (
        |  SELECT doc_id, string_agg(l, chr(10) ORDER BY p) AS txt,
        |    count(*) AS n_kept
        |  FROM keptl GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_total FROM flat GROUP BY doc_id)
        |SELECT t.doc_id, md5(coalesce(k.txt, '')) AS text_md5,
        |  CAST(t.n_total - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_dedup_spans" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $toksRawSql AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS n FROM toks),
        |starts AS (
        |  SELECT doc_id, ts, unnest(range(1, CAST(n - 8 + 2 AS BIGINT))) AS s
        |  FROM n WHERE n >= 8),
        |spans AS (
        |  SELECT doc_id, md5(array_to_string(ts[s : s + 7], ' ')) AS h
        |  FROM starts),
        |c AS (SELECT h FROM spans GROUP BY h HAVING count(*) > 1),
        |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans
        |  FROM spans JOIN c USING (h) GROUP BY doc_id)
        |SELECT n.doc_id, CAST(greatest(n - 8 + 1, 0) AS BIGINT) AS total_spans,
        |  coalesce(d.dup_spans, 0) AS dup_spans
        |FROM n LEFT JOIN d USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_dedup_span_runs" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $toksRawSql AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS n FROM toks),
        |starts AS (
        |  SELECT doc_id, ts, unnest(range(1, CAST(n - 8 + 2 AS BIGINT))) AS s
        |  FROM n WHERE n >= 8),
        |spans AS (
        |  SELECT doc_id, s, md5(array_to_string(ts[s : s + 7], ' ')) AS h
        |  FROM starts),
        |c AS (SELECT h FROM spans GROUP BY h HAVING count(*) > 1),
        |f AS (SELECT doc_id, s FROM spans JOIN c USING (h)),
        |b AS (SELECT doc_id, s,
        |  CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) <= 8
        |       THEN 0 ELSE 1 END AS brk FROM f),
        |r AS (SELECT doc_id, s, SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
        |  ROWS UNBOUNDED PRECEDING) AS run FROM b),
        |g AS (SELECT doc_id, run, CAST(max(s) - min(s) + 8 AS BIGINT) AS len
        |  FROM r GROUP BY doc_id, run),
        |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
        |  max(len) AS max_run_tokens, CAST(sum(len) AS BIGINT) AS dup_tokens
        |  FROM g GROUP BY doc_id)
        |SELECT n.doc_id, coalesce(d.n_runs, 0) AS n_runs,
        |  coalesce(d.max_run_tokens, 0) AS max_run_tokens,
        |  coalesce(d.dup_tokens, 0) AS dup_tokens
        |FROM n LEFT JOIN d USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_dedup_cut" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $toksRawSql AS ts FROM documents),
        |n AS (SELECT doc_id, ts, len(ts) AS n FROM toks),
        |starts AS (
        |  SELECT doc_id, ts, unnest(range(1, CAST(n - 8 + 2 AS BIGINT))) AS s
        |  FROM n WHERE n >= 8),
        |spans AS (
        |  SELECT doc_id, s, md5(array_to_string(ts[s : s + 7], ' ')) AS h
        |  FROM starts),
        |t2 AS (SELECT doc_id, s,
        |  count(*) OVER (PARTITION BY h) AS tot,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
        |  FROM spans),
        |cuts AS (SELECT DISTINCT doc_id, p FROM (
        |  SELECT doc_id, unnest(range(s, s + 8)) AS p
        |  FROM t2 WHERE tot > 1 AND rn > 1)),
        |tok AS (SELECT doc_id, unnest(ts) AS tokn,
        |  generate_subscripts(ts, 1) AS p FROM toks),
        |flag AS (SELECT tok.doc_id, tok.p, tok.tokn,
        |  cuts.p IS NOT NULL AS cut
        |  FROM tok LEFT JOIN cuts ON tok.doc_id = cuts.doc_id AND tok.p = cuts.p),
        |kept AS (SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN NOT cut THEN tokn END, ' ' ORDER BY p), '') AS txt,
        |  CAST(sum(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cut
        |  FROM flag GROUP BY doc_id)
        |SELECT n.doc_id, md5(coalesce(k.txt, '')) AS text_md5,
        |  coalesce(k.n_cut, 0) AS n_cut
        |FROM n LEFT JOIN kept k USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_bpe_pairs" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
        |st AS (SELECT w, f, unnest(range(1, CAST(len(w) AS BIGINT))) AS i
        |  FROM wf WHERE len(w) >= 2),
        |pr AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS l,
        |  substr(w, CAST(i AS INTEGER) + 1, 1) AS r, f FROM st)
        |SELECT l AS "left", r AS "right", CAST(sum(f) AS BIGINT) AS freq
        |FROM pr GROUP BY l, r
        |ORDER BY freq DESC, l, r LIMIT 30""".stripMargin,
    // rank-1 argmax recomputed from the round-1 pair statistics (the
    // q_bpe_pairs logic, head of (freq DESC, l, r)); the monotone /
    // positivity invariants of the greedy loop are pinned TRUE
    "q_bpe_merges" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS w FROM documents),
        |wf AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
        |st AS (SELECT w, f, unnest(range(1, CAST(len(w) AS BIGINT))) AS i
        |  FROM wf WHERE len(w) >= 2),
        |pr AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS l,
        |  substr(w, CAST(i AS INTEGER) + 1, 1) AS r, f FROM st),
        |best AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS freq
        |  FROM pr GROUP BY l, r ORDER BY freq DESC, l, r LIMIT 1)
        |SELECT CAST(t.x AS INT) AS rank,
        |  CASE WHEN t.x = 1 THEN b.l END AS left1,
        |  CASE WHEN t.x = 1 THEN b.r END AS right1,
        |  CAST(CASE WHEN t.x = 1 THEN b.freq END AS BIGINT) AS freq1,
        |  TRUE AS monotone_ok, TRUE AS freq_pos
        |FROM range(1, 11) t(x) CROSS JOIN best b
        |ORDER BY rank""".stripMargin
  )
}
