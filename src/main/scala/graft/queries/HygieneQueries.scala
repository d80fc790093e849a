package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Decontamination, Redaction, Sampling}

/** Corpus-hygiene operators of a training-data pipeline: benchmark
  * decontamination (n-gram overlap vs an eval set), PII redaction
  * (typed placeholder scrubbing + audit counts), and mixture
  * (per-domain-weighted) sampling.
  *
  * All three are fully oracle-checked: overlap counts are integer
  * set arithmetic, redaction patterns deliberately use only regex
  * constructs whose semantics agree between Java regex (Spark) and
  * RE2 (DuckDB), and mixture sampling reuses the md5-threshold rule
  * the uniform/stratified entries already pin cross-engine.
  */
object HygieneQueries {
  import Q._

  /** The "benchmark" eval set for decontamination entries: a fixed
    * deterministic slice of `documents`. */
  private val benchPred = col("doc_id") % 20 === 7

  /** Deterministic PII augmentation: the synthetic corpus contains no
    * addresses, so the query plants one per doc-id residue class —
    * e-mail / IPv4 / phone / none — and the engines must then agree
    * on what redaction finds and rewrites. */
  private def augmented = concat(col("text"),
    when(col("doc_id") % 4 === 0,
      concat(lit(" mail u"), col("doc_id"), lit("@ex"), col("doc_id") % 7, lit(".org")))
      .when(col("doc_id") % 4 === 1,
        concat(lit(" host 10."), col("doc_id") % 200, lit(".3."), col("doc_id") % 250))
      .when(col("doc_id") % 4 === 2,
        concat(lit(" tel +9418"), col("doc_id") % 1000000 + 1000000))
      .otherwise(lit("")))

  val queries: Map[String, QFn] = Map(
    "q_decontam_scores" -> ((s, dir) => {
      // (doc_id, shared-distinct-shingle count) per corpus doc vs the
      // benchmark slice; zero-overlap docs absent by contract
      val docs = t(s, dir, "documents")
      Decontamination.contaminationScores(
          docs.filter(!benchPred), docs.filter(benchPred))
        .orderBy(col("doc_id"))
    }),
    "q_decontaminate" -> ((s, dir) => {
      // corpus minus docs sharing ≥ 5 distinct 3-gram shingles with
      // the benchmark slice (the n-gram collision rule)
      val docs = t(s, dir, "documents")
      Decontamination.decontaminate(
          docs.filter(!benchPred), docs.filter(benchPred), minHits = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),
    "q_decontam_bloom" -> ((s, dir) => {
      // bloom-probe decontamination at fpp 1e-8: on this corpus the
      // bloom pass has no false positives, so the output equals the
      // exact rule and the EXACT DuckDB replay is the oracle (a
      // false positive would surface as a missing row — red, not
      // silently wrong)
      val docs = t(s, dir, "documents")
      Decontamination.decontaminateBloom(
          docs.filter(!benchPred), docs.filter(benchPred), minHits = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),
    "q_redact" -> ((s, dir) => {
      val aug = t(s, dir, "documents").select(col("doc_id"), augmented.as("_aug"))
      aug.select(col("doc_id"),
          Redaction.emailCount(col("_aug")).as("n_emails"),
          Redaction.ipv4Count(col("_aug")).as("n_ipv4"),
          Redaction.phoneCount(col("_aug")).as("n_phones"),
          md5(Redaction.redactText(col("_aug"))).as("red_md5"))
        .orderBy(col("doc_id"))
    }),
    "q_heavy_shingles" -> ((s, dir) => {
      // heavy-hitter shingles: the df skew audit behind the SSJoin
      // prefix filter (frequent shingles drive the candidate
      // quadratic term). One partial-aggregable groupBy + top-k sort;
      // deterministic ties by shingle value.
      t(s, dir, "documents")
        .select(explode(call_function("shingle_set", col("text"), lit(3))).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(20)
    }),
    "q_decontam_semantic" -> ((s, dir) => {
      // embedding-space contamination vs a benchmark slice: hit count
      // + max cosine per corpus vector (cosine arithmetic bit-matches
      // DuckDB's list_cosine_similarity, as q_dedup_cosine pins)
      val emb = t(s, dir, "embeddings")
      Decontamination.semanticScores(
          emb.filter(col("vec_id") % 20 =!= 7),
          emb.filter(col("vec_id") % 20 === 7), threshold = 0.35)
        .orderBy(col("vec_id"))
    }),
    "q_psi" -> ((s, dir) => {
      // Population Stability Index of each source's n_chars
      // distribution vs the src0 reference — the drift metric model
      // monitoring uses next to KL (q_source_kl). Fixed-width buckets
      // (no global sort), Laplace 0.5 smoothing over the dense 6-bucket
      // grid, and the per-source sum folds a bucket-SORTED array so
      // the float total is order-deterministic cross-engine.
      val d = t(s, dir, "documents")
        .select(col("source"), floor(col("n_chars") / 100).cast("int").as("b"))
      val counts = d.groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
      val dense = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("b", explode(sequence(lit(0), lit(5))))
        .join(counts, Seq("source", "b"), "left")
        .na.fill(0, Seq("c"))
        .withColumn("p", (col("c") + 0.5) / (col("n") + 3.0))
      val ref = dense.filter(col("source") === "src0")
        .select(col("b"), col("p").as("q"))
      dense.filter(col("source") =!= "src0")
        .join(broadcast(ref), "b")
        .withColumn("contrib", (col("p") - col("q")) * log(col("p") / col("q")))
        .groupBy(col("source"))
        .agg(round(expr(
          "aggregate(array_sort(collect_list(struct(b, contrib))), " +
            "cast(0 as double), (a, x) -> a + x.contrib)"), 6).as("psi"))
        .orderBy(col("source"))
    }),
    "q_benford" -> ((s, dir) => {
      // Benford first-digit audit over order totals: per-digit counts,
      // observed share, the Benford expectation log10(1 + 1/d), and
      // the chi-square contribution — the classic fabricated-data
      // screen. First digit extracted via integer/string arithmetic
      // (never float log10 of the value — engines could disagree at a
      // power-of-ten boundary).
      val o = t(s, dir, "orders").withColumn("d",
        substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int"))
      val exp = log(lit(1) + lit(1.0) / col("d")) / log(lit(10.0))
      o.groupBy(col("d")).agg(count(lit(1)).as("n_d"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
        .withColumn("share", round(col("n_d") / col("n"), 6))
        .withColumn("benford", round(exp, 6))
        .withColumn("chi2_part",
          round(pow(col("n_d") - col("n") * exp, 2) / (col("n") * exp), 6))
        .select(col("d"), col("n_d"), col("share"), col("benford"),
          col("chi2_part"))
        .orderBy(col("d"))
    }),
    "q_seasonal_z" -> ((s, dir) => {
      // Seasonally-adjusted z-score: each event scored against its
      // (event_type, day-of-week) population — mean/std from EXACT
      // decimal sums (Σx, Σx² in DECIMAL, one double sqrt at the end)
      // so the scores are bit-reproducible. Zero-variance groups
      // yield NULL, not Inf.
      val e = t(s, dir, "events").filter(col("event_id") < 3000)
        .select(col("event_id"), col("event_type"),
          dayofweek(col("ts")).cast("int").as("dow"), col("value"))
      val prof = e.groupBy(col("event_type"), col("dow")).agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).as("s1"),
        sum(dec(col("value")) * dec(col("value"))).as("s2"))
      val mean = d(col("s1")) / col("n")
      val variance = (col("n") * d(col("s2")) - d(col("s1")) * d(col("s1"))) /
        (col("n") * (col("n") - 1))
      e.join(prof, Seq("event_type", "dow"))
        .filter(col("n") >= 2)
        .withColumn("z", when(variance > 0,
          round((col("value") - mean) / sqrt(variance), 6)))
        .select(col("event_id"), col("event_type"), col("dow"),
          col("value"), col("z"))
        .orderBy(col("event_id"))
    }),
    "q_quality_rules" -> ((s, dir) => {
      // Gopher-style rule signals + composite pass flag; all-integer
      // thresholds so the flag is engine-exact. The required-stopword
      // set is adapted to the synthetic corpus's vocabulary (only
      // 'the'/'a' of Gopher's English set occur in it) so the flag
      // actually discriminates — the operator's default stays the
      // published list.
      graft.llm.TextAnalysis.qualityRules(t(s, dir, "documents"),
          requiredStopwords = Seq("the", "a", "key", "value", "table", "row"))
        .orderBy(col("doc_id"))
    }),
    "q_outlier_mad" -> ((s, dir) => {
      // robust outlier audit: median / MAD per event_type, rows with
      // |x − med| > 3·MAD flagged — the heavy-tail-safe anomaly gate
      // (stddev fences break under the very outliers they hunt).
      // percentile_disc selects ACTUAL data values, so med/MAD and
      // the flag are engine-exact; two partial-aggregable rollups +
      // one broadcast-sized stats join, no window over the raw rows.
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(value - med))").as("mad"))
      ev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("med")) > col("mad") * 3, 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),
    "q_corpus_report" -> ((s, dir) => {
      // the dataset-card audit: per source, docs / distinct contents /
      // exact-dup docs / tokens / quality-pass — a composition of
      // exactGroups + qualityRules whose outputs are ALL integers, so
      // the cross-engine hash certifies the composed pipeline. One
      // corpus scan feeds the md5 groupBy; the quality signals are
      // scan-side projections joined back by id.
      val docs = t(s, dir, "documents")
      val qr = graft.llm.TextAnalysis.qualityRules(docs,
        requiredStopwords = Seq("the", "a", "key", "value", "table", "row"))
      val withHash = docs.select(col("doc_id"), col("source"), md5(col("text")).as("_h"))
      val dupCnt = withHash.groupBy(col("_h")).agg(count(lit(1)).as("_copies"))
      withHash.join(dupCnt, "_h")
        .join(qr.select(col("doc_id"), col("n_tokens"), col("pass")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("_h")).as("n_distinct_text"),
          sum(when(col("_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_quality_pass"))
        .orderBy(col("source"))
    }),
    "q_sample_mixture" -> ((s, dir) => {
      Sampling.mixtureSample(t(s, dir, "documents"), "source", "doc_id",
          weights = Map("src0" -> 0.5, "src1" -> 0.4, "src2" -> 0.3, "src3" -> 0.2),
          defaultFraction = 0.05)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }),
    "q_winsorize" -> ((s, dir) => {
      // winsorized mean per group: clip every value to the group's
      // exact [p05, p95] (percentile_approx in its exact regime —
      // accuracy ≥ group size) before averaging, the robust-mean rule
      // that stops tail outliers from dominating a quality score.
      // Shape: one group-count-sized percentile aggregate broadcast
      // back onto the scan, then one exact-decimal aggregate — never
      // a global sort, and the clip itself is a codegen'd
      // least/greatest on the scan.
      val ev = t(s, dir, "events")
      val pct = ev.groupBy(col("event_type"))
        .agg(percentile_approx(col("value"), lit(0.05), lit(10000000)).as("p05"),
          percentile_approx(col("value"), lit(0.95), lit(10000000)).as("p95"))
      ev.join(broadcast(pct), "event_type")
        .withColumn("v", least(greatest(col("value"), col("p05")), col("p95")))
        .groupBy(col("event_type"))
        .agg(first(col("p05")).as("p05"), first(col("p95")).as("p95"),
          count(lit(1)).as("n"),
          count(when(col("value") < col("p05"), 1)).as("n_lo"),
          count(when(col("value") > col("p95"), 1)).as("n_hi"),
          avgDec(col("v")).as("wmean"))
        .orderBy(col("event_type"))
    })
  )

  /** Shared DuckDB fragment: word-3-gram shingle sets per doc (same
    * tokenizer class as the Spark `shingle_set` kernel). */
  private[queries] val shingleCte =
    """sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [txt] END) AS s
      |  FROM (SELECT doc_id, lower(text) AS txt,
      |          list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> length(x) > 0) AS toks
      |        FROM documents))""".stripMargin

  private val augSql =
    """text || CASE
      |  WHEN doc_id % 4 = 0 THEN ' mail u' || doc_id || '@ex' || (doc_id % 7) || '.org'
      |  WHEN doc_id % 4 = 1 THEN ' host 10.' || (doc_id % 200) || '.3.' || (doc_id % 250)
      |  WHEN doc_id % 4 = 2 THEN ' tel +9418' || (doc_id % 1000000 + 1000000)
      |  ELSE '' END""".stripMargin

  private val emailPat = Redaction.EmailPattern
  private val ipv4Pat = Redaction.Ipv4Pattern
  private val phonePat = Redaction.PhonePattern

  val oracle: Map[String, String] = Map(
    "q_psi" ->
      """WITH d AS (SELECT source, CAST(floor(n_chars/100) AS INT) AS b
        |           FROM documents),
        |counts AS (SELECT source, b, count(*) AS c FROM d GROUP BY 1, 2),
        |dense AS (
        |  SELECT t.source, t.n, g.b, coalesce(c.c, 0) AS c,
        |    (coalesce(c.c, 0) + 0.5) / (t.n + 3.0) AS p
        |  FROM (SELECT source, count(*) AS n FROM d GROUP BY 1) t
        |  CROSS JOIN (SELECT unnest(range(0, 6)) AS b) g
        |  LEFT JOIN counts c ON c.source = t.source AND c.b = g.b),
        |ref AS (SELECT b, p AS q FROM dense WHERE source = 'src0')
        |SELECT dense.source,
        |  round(list_reduce(list((p - q) * ln(p / q) ORDER BY dense.b),
        |    (a, x) -> a + x), 6) AS psi
        |FROM dense JOIN ref USING (b) WHERE dense.source <> 'src0'
        |GROUP BY dense.source ORDER BY source""".stripMargin,
    "q_benford" ->
      """WITH o AS (
        |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS d
        |  FROM orders),
        |agg AS (SELECT d, count(*) AS n_d FROM o GROUP BY d),
        |t AS (SELECT count(*) AS n FROM o)
        |SELECT agg.d, CAST(agg.n_d AS BIGINT) AS n_d,
        |  round(agg.n_d / t.n, 6) AS share,
        |  round(ln(1 + 1.0/agg.d) / ln(10), 6) AS benford,
        |  round(pow(agg.n_d - t.n * (ln(1 + 1.0/agg.d) / ln(10)), 2)
        |    / (t.n * (ln(1 + 1.0/agg.d) / ln(10))), 6) AS chi2_part
        |FROM agg CROSS JOIN t ORDER BY agg.d""".stripMargin,
    "q_seasonal_z" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow, value
        |  FROM events WHERE event_id < 3000),
        |prof AS (
        |  SELECT event_type, dow, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS s1,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS s2
        |  FROM e GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type, e.dow, e.value,
        |  CASE WHEN (prof.n * CAST(prof.s2 AS DOUBLE)
        |        - CAST(prof.s1 AS DOUBLE) * CAST(prof.s1 AS DOUBLE))
        |        / (prof.n * (prof.n - 1)) > 0
        |    THEN round((e.value - CAST(prof.s1 AS DOUBLE) / prof.n)
        |      / sqrt((prof.n * CAST(prof.s2 AS DOUBLE)
        |          - CAST(prof.s1 AS DOUBLE) * CAST(prof.s1 AS DOUBLE))
        |        / (prof.n * (prof.n - 1))), 6) END AS z
        |FROM e JOIN prof USING (event_type, dow)
        |WHERE prof.n >= 2 ORDER BY e.event_id""".stripMargin,
    "q_decontam_scores" ->
      s"""WITH $shingleCte,
        |bench AS (SELECT DISTINCT unnest(s) AS ng FROM sh WHERE doc_id % 20 = 7),
        |corp AS (SELECT doc_id, unnest(s) AS ng FROM sh WHERE doc_id % 20 <> 7)
        |SELECT doc_id, COUNT(*) AS n_hits
        |FROM corp JOIN bench USING (ng)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      s"""WITH $shingleCte,
        |bench AS (SELECT DISTINCT unnest(s) AS ng FROM sh WHERE doc_id % 20 = 7),
        |corp AS (SELECT doc_id, unnest(s) AS ng FROM sh WHERE doc_id % 20 <> 7),
        |bad AS (SELECT doc_id FROM corp JOIN bench USING (ng)
        |        GROUP BY doc_id HAVING COUNT(*) >= 5)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id % 20 <> 7 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY d.doc_id""".stripMargin,
    "q_decontam_bloom" ->
      s"""WITH $shingleCte,
        |bench AS (SELECT DISTINCT unnest(s) AS ng FROM sh WHERE doc_id % 20 = 7),
        |corp AS (SELECT doc_id, unnest(s) AS ng FROM sh WHERE doc_id % 20 <> 7),
        |bad AS (SELECT doc_id FROM corp JOIN bench USING (ng)
        |        GROUP BY doc_id HAVING COUNT(*) >= 5)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id % 20 <> 7 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY d.doc_id""".stripMargin,
    "q_redact" ->
      s"""WITH aug AS (SELECT doc_id, $augSql AS a FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a, '$emailPat')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(a, '$ipv4Pat')) AS INT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(a, '$phonePat')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(a,
        |    '$emailPat', '<EMAIL>', 'g'),
        |    '$ipv4Pat', '<IP>', 'g'),
        |    '$phonePat', '<PHONE>', 'g')) AS red_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "q_heavy_shingles" ->
      s"""WITH $shingleCte
        |SELECT ng AS shingle, CAST(COUNT(*) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(s) AS ng FROM sh)
        |GROUP BY ng ORDER BY df DESC, shingle LIMIT 20""".stripMargin,
    "q_decontam_semantic" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE vec_id % 20 <> 7),
        |b AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 20 = 7),
        |p AS (SELECT c.vec_id, list_cosine_similarity(c.v, b.v) AS cos
        |      FROM c CROSS JOIN b)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits, MAX(cos) AS max_cos
        |FROM p WHERE cos >= 0.35 GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q_quality_rules" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '[ \t\n\f\r]+'), x -> length(x) > 0) AS toks,
        |    list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> length(x) > 0) AS ltoks,
        |    list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS lns
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) AS BIGINT) AS sum_token_len,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
        |    CAST(len(lns) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lns, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%')) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lns, x -> x LIKE '%...' OR x LIKE '%…')) AS BIGINT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_tokens,
        |    CAST(len(list_filter(['the','a','key','value','table','row'],
        |      w -> list_contains(ltoks, w))) AS BIGINT) AS n_req_stopwords
        |  FROM b)
        |SELECT *, (n_tokens BETWEEN 50 AND 100000
        |  AND sum_token_len >= n_tokens * 3 AND sum_token_len <= n_tokens * 10
        |  AND n_symbols * 10 <= n_tokens
        |  AND n_bullet_lines * 10 <= n_lines * 9
        |  AND n_ellipsis_lines * 10 <= n_lines * 3
        |  AND n_alpha_tokens * 5 >= n_tokens * 4
        |  AND n_req_stopwords >= 2) AS pass
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_outlier_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_disc(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, m.med, quantile_disc(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type, m.med)
        |SELECT e.event_type, m.med, m.mad,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN abs(e.value - m.med) > m.mad * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY e.event_type, m.med, m.mad
        |ORDER BY e.event_type""".stripMargin,
    "q_corpus_report" ->
      """WITH b AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |    CAST(len(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) AS BIGINT) AS stl,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols,
        |    CAST(len(list_filter(string_split(text, chr(10)), x -> length(x) > 0)) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(list_filter(string_split(text, chr(10)), x -> length(x) > 0),
        |      x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%')) AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(list_filter(string_split(text, chr(10)), x -> length(x) > 0),
        |      x -> x LIKE '%...' OR x LIKE '%…')) AS BIGINT) AS n_ell,
        |    CAST(len(list_filter(list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |      x -> length(x) > 0), x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(['the','a','key','value','table','row'],
        |      w -> list_contains(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
        |        x -> length(x) > 0), w))) AS BIGINT) AS n_req
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, h, n_tokens,
        |    (n_tokens BETWEEN 50 AND 100000
        |      AND stl >= n_tokens * 3 AND stl <= n_tokens * 10
        |      AND n_symbols * 10 <= n_tokens
        |      AND n_bullet * 10 <= n_lines * 9
        |      AND n_ell * 10 <= n_lines * 3
        |      AND n_alpha * 5 >= n_tokens * 4
        |      AND n_req >= 2) AS pass
        |  FROM b),
        |dc AS (SELECT h, count(*) AS copies FROM b GROUP BY h)
        |SELECT p.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT p.h) AS BIGINT) AS n_distinct_text,
        |  CAST(sum(CASE WHEN dc.copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN p.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass
        |FROM p JOIN dc USING (h)
        |GROUP BY p.source ORDER BY p.source""".stripMargin,
    "q_sample_mixture" ->
      s"""SELECT source, doc_id FROM documents
        |WHERE substr(md5(doc_id::VARCHAR), 1, 8) < CASE source
        |  WHEN 'src0' THEN '${Sampling.hexThreshold(0.5)}'
        |  WHEN 'src1' THEN '${Sampling.hexThreshold(0.4)}'
        |  WHEN 'src2' THEN '${Sampling.hexThreshold(0.3)}'
        |  WHEN 'src3' THEN '${Sampling.hexThreshold(0.2)}'
        |  ELSE '${Sampling.hexThreshold(0.05)}' END
        |ORDER BY source, doc_id""".stripMargin,
    "q_winsorize" ->
      s"""WITH p AS (SELECT event_type,
        |    quantile_disc(value, 0.05) AS p05,
        |    quantile_disc(value, 0.95) AS p95
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, p.p05, p.p95,
        |  COUNT(*) AS n,
        |  CAST(COUNT(CASE WHEN e.value < p.p05 THEN 1 END) AS BIGINT) AS n_lo,
        |  CAST(COUNT(CASE WHEN e.value > p.p95 THEN 1 END) AS BIGINT) AS n_hi,
        |  ${Q.oAvgDec("least(greatest(e.value, p.p05), p.p95)")} AS wmean
        |FROM events e JOIN p USING (event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  )
}
