package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token/char statistics, quality scoring, language
  * identification, and document fingerprinting.
  *
  * Everything here is compositional over Spark's codegen'd built-ins
  * and higher-order array functions — no UDFs, so a 100 TB scan of
  * `documents` stays inside whole-stage codegen and distributes
  * row-parallel with zero shuffles until the caller aggregates.
  */
object TextAnalysis {

  /** Whitespace tokenizer. The split class is the explicit ASCII set
    * `[ \t\n\f\r]` rather than `\s`: Java's `\s` additionally matches
    * U+000B where RE2's (the DuckDB oracle's regex engine) does not,
    * so the explicit class is the one spelling both engines agree on. */
  def tokens(text: Column): Column = filter(split(text, "[ \\t\\n\\f\\r]+"), t => length(t) > 0)

  /** BPE-ish subword-boundary tokenizer: splits on whitespace AND at
    * letter/digit/punctuation boundaries (the regex analog of a
    * byte-pair pre-tokenizer's initial segmentation). */
  def tokensBpe(text: Column): Column =
    filter(
      split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(t) > 0 && t =!= lit(" "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Segment count of `tokensBpe`, as a native codegen kernel (the
    * lookaround split + filter HOF is interpreted per row; the
    * kernel is one static call — see TextNativeFunctions). */
  def bpeTokenCount(text: Column): Column = call_function("bpe_token_count", text)
  def charCount(text: Column): Column = length(text)

  /** Ratio of non-alphanumeric, non-space chars to all chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text).cast(DoubleType)
    val clean = length(regexp_replace(text, "[\\p{L}\\p{N} \\t\\n\\f\\r]", "")).cast(DoubleType)
    when(total > 0, clean / total).otherwise(lit(0.0))
  }

  /** Mean token length in characters. Token lengths sum to exactly
    * the non-whitespace character count, so the numerator is one
    * native regexp_replace+length instead of an interpreted
    * `aggregate` fold over the token array. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      length(regexp_replace(text, "[ \\t\\n\\f\\r]", "")).cast(DoubleType) / size(ts))
      .otherwise(lit(0.0))
  }

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "was", "for", "on", "are", "as", "with", "at", "be")

  /** Fraction of tokens that are (English) stopwords — a standard
    * fluency signal in quality classifiers. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val ts = tokens(lower(text))
    val sw = lit(stopwords.toArray)
    when(size(ts) > 0,
      size(filter(ts, t => array_contains(sw, t))).cast(DoubleType) / size(ts))
      .otherwise(lit(0.0))
  }

  /** Gopher-style heuristic quality rules (the published
    * corpus-filtering rule set of Rae et al. 2021, §A1.1): per
    * document, the raw integer signals each rule reads plus the
    * composite `pass` flag —
    *  - 50 ≤ word count ≤ 100,000
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio ('#' and '...') ≤ 0.1
    *  - < 90% of lines start with a bullet, ≤ 30% end with ellipsis
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 distinct hits in a required-stopword set
    * Signals are integer counts and every threshold is integer
    * arithmetic (10·symbols ≤ words, not symbols/words ≤ 0.1), so the
    * DuckDB oracle replays the flag bit-exactly — no float grid. One
    * per-row projection: no shuffle, no UDF; at 100 TB this is a pure
    * scan-side filter like [[qualityScore]]. */
  def qualityRules(docs: org.apache.spark.sql.DataFrame,
      id: String = "doc_id", text: String = "text",
      requiredStopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"))
      : org.apache.spark.sql.DataFrame = {
    val req = requiredStopwords
    val ts = tokens(col(text))
    val lts = tokens(lower(col(text)))
    val lns = filter(split(col(text), "\n"), l => length(l) > 0)
    val nTok = size(ts).cast("long")
    val sumTl = length(regexp_replace(col(text), "[ \\t\\n\\f\\r]", "")).cast("long")
    // non-overlapping left-to-right '...' occurrences — replace-and-
    // diff, the same counting rule both engines implement natively
    val nHash = (length(col(text)) - length(replace(col(text), lit("#"), lit("")))).cast("long")
    val nEll = floor((length(col(text))
      - length(replace(col(text), lit("..."), lit("")))) / 3).cast("long")
    docs.select(col(id),
        nTok.as("n_tokens"),
        sumTl.as("sum_token_len"),
        (nHash + nEll).as("n_symbols"),
        size(lns).cast("long").as("n_lines"),
        size(filter(lns, l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
          .cast("long").as("n_bullet_lines"),
        size(filter(lns, l => l.endsWith("...") || l.endsWith("…")))
          .cast("long").as("n_ellipsis_lines"),
        size(filter(ts, t => t.rlike("[a-zA-Z]"))).cast("long").as("n_alpha_tokens"),
        // count over the CONSTANT stopword list (inherently distinct) —
        // sidesteps engine-specific list_intersect dedup semantics
        size(filter(lit(req.toArray), w => array_contains(lts, w)))
          .cast("long").as("n_req_stopwords"))
      .withColumn("pass",
        col("n_tokens").between(50, 100000) &&
        col("sum_token_len") >= col("n_tokens") * 3 &&
        col("sum_token_len") <= col("n_tokens") * 10 &&
        col("n_symbols") * 10 <= col("n_tokens") &&
        col("n_bullet_lines") * 10 <= col("n_lines") * 9 &&
        col("n_ellipsis_lines") * 10 <= col("n_lines") * 3 &&
        col("n_alpha_tokens") * 5 >= col("n_tokens") * 4 &&
        col("n_req_stopwords") >= 2)
  }

  /** Composite quality score in [0,1]: length sweet-spot ×
    * (1 − punct excess) × stopword-presence signal. Deterministic and
    * cheap; the shape mirrors heuristic pre-filters used before
    * model-based quality scoring. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast(DoubleType)
    val lenScore = least(n / 50.0, lit(1.0)) * when(n > 5000, 0.5).otherwise(1.0)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val swScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * punctScore * swScore, 6)
  }

  /** Stopword tables for the language-ID heuristic. */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> EnStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "auf", "für", "von", "zu", "den", "im", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "du",
      "pour", "dans", "que", "qui", "sur", "pas", "avec"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de",
      "en", "que", "por", "con", "para", "del", "se"))

  /** N-gram/stopword language-ID heuristic: the language whose
    * stopword table hits the most tokens wins; 'und' (undetermined)
    * when nothing hits. Distinct-token hits (array_intersect) so a
    * single repeated word can't dominate. */
  def langId(text: Column): Column = {
    val ts = array_distinct(tokens(lower(text)))
    val scores = LangStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(ts, lit(words.toArray)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), elseCol) =>
      when(score === best && score > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Single-pass document profile: tokenize ONCE (explode → one
    * partial-aggregable groupBy), derive language-ID, quality score
    * and token statistics from the aggregated counts. The
    * Column-based helpers above are convenient for ad-hoc use but
    * each call re-tokenizes inside an interpreted HOF — on a corpus
    * scan this one-pass shape is the difference between O(1) and
    * O(#features) tokenizations per document.
    *
    * Output: (id, n_tokens, sum_token_len, sw_hits, lang_pred,
    * quality). Docs with no tokens profile as ('und', 0.0). */
  def profiles(docs: org.apache.spark.sql.DataFrame,
      id: String = "doc_id", text: String = "text"): org.apache.spark.sql.DataFrame = {
    val langs = LangStopwords.toSeq.sortBy(_._1)
    val toks = docs.select(col(id).as("_id"), explode(tokens(lower(col(text)))).as("_t"))
    val langHitCols = langs.map { case (lang, words) =>
      // distinct stopword hits, so one repeated word can't dominate
      count_distinct(when(col("_t").isin(words: _*), col("_t"))).as(s"_hits_$lang")
    }
    val aggCols = Seq(
      count(lit(1)).as("n_tokens"),
      sum(length(col("_t"))).as("sum_token_len"),
      sum(when(col("_t").isin(EnStopwords: _*), 1).otherwise(0)).as("sw_hits")
    ) ++ langHitCols
    val prof = toks.groupBy(col("_id")).agg(aggCols.head, aggCols.tail: _*)

    val best = langs.map(l => col(s"_hits_${l._1}")).reduce((a, b) => greatest(a, b))
    val langPred = langs.foldRight(lit("und")) { case ((lang, _), elseCol) =>
      when(col(s"_hits_$lang") === best && best > 0, lit(lang)).otherwise(elseCol)
    }

    val punct = {
      val total = length(col(text)).cast(DoubleType)
      val p = length(regexp_replace(col(text), "[\\p{L}\\p{N} \\t\\n\\f\\r]", "")).cast(DoubleType)
      when(total > 0, p / total).otherwise(lit(0.0))
    }
    val n = col("n_tokens").cast(DoubleType)
    val lenScore = least(n / 50.0, lit(1.0)) * when(n > 5000, 0.5).otherwise(1.0)
    val punctScore = greatest(lit(0.0), lit(1.0) - punct * 4.0)
    val swScore = least(col("sw_hits").cast(DoubleType) / n * 4.0, lit(1.0))

    docs.select(col(id), col(text))
      .join(prof, col(id) === col("_id"), "left")
      .select(
        col(id),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_token_len"), lit(0L)).as("sum_token_len"),
        coalesce(col("sw_hits"), lit(0L)).as("sw_hits"),
        coalesce(langPred, lit("und")).as("lang_pred"),
        // unrounded: round(double, n) diverges between engines; callers
        // that need a stable grid use floor(quality * 1e6)
        coalesce(lenScore * punctScore * swScore, lit(0.0)).as("quality"))
  }

  /** Distinctive terms per document — tf-idf-flavored keyword
    * extraction with an integer-exact ordering: terms rank by
    * (tf DESC, df ASC, term ASC) — most frequent in the doc, ties
    * broken toward corpus-rare — and the top `k` survive. For fixed
    * tf this is exactly the order idf induces, without the
    * libm-variant ln() a literal tf·idf score would put between the
    * engines. One exploded-token pipeline: per-doc tf is a
    * partial-aggregable groupBy, df aggregates the (doc, term) rows
    * tf already produced (no second tokenization), and the top-k
    * window is bounded per doc — every stage partial-aggregates, so
    * the shape survives a 100 TB corpus. */
  def distinctiveTerms(docs: org.apache.spark.sql.DataFrame, k: Int = 3,
      id: String = "doc_id", text: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(id).as("_id"),
      explode(tokens(lower(col(text)))).as("_t"))
    val tf = toks.groupBy(col("_id"), col("_t")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("_t")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("_id")).orderBy(col("tf").desc, col("df"), col("_t"))
    tf.join(dfT, "_t")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("_id").as(id), col("_t").as("term"),
        col("tf"), col("df"), col("rnk").cast("int").as("rnk"))
  }

  /** Repetition profile — the within-document repetition signals of
    * published corpus-filtering rules (repeated lines / repeated
    * n-grams mark templated or spam text): per doc,
    *  - n_lines / n_distinct_lines (newline-split, empties dropped),
    *  - n_2grams / n_distinct_2grams (whitespace tokens),
    *  - top_2gram_count (occurrences of the most frequent 2-gram).
    * The line counts are per-row array expressions (no shuffle); ALL
    * the 2-gram statistics (total, distinct, top count) come from ONE
    * exploded-gram pipeline through a two-level partial-aggregable
    * groupBy — the gram array is built once per document and every
    * stat is a codegen'd aggregate over its rows (a first cut
    * computed the distinct count as a second per-row
    * `array_distinct(transform(...))` HOF: 12 s at sf0.1 vs ~1 s for
    * this shape — the interpreted-HOF trap, again).
    * All-integer output → engine-exact oracle. */
  def repetitionProfile(docs: org.apache.spark.sql.DataFrame,
      id: String = "doc_id", text: String = "text"): org.apache.spark.sql.DataFrame = {
    val lines = filter(split(col(text), "\n"), l => length(l) > 0)
    val grams = docs.select(col(id).as("_id"), tokens(col(text)).as("_ts"))
      .filter(size(col("_ts")) >= 2)
      .select(col("_id"), explode(transform(sequence(lit(0), size(col("_ts")) - 2),
        i => concat_ws(" ", col("_ts").getItem(i), col("_ts").getItem(i + 1)))).as("_g"))
    val gstats = grams.groupBy(col("_id"), col("_g")).agg(count(lit(1)).as("_c"))
      .groupBy(col("_id")).agg(
        sum(col("_c")).as("_n2"),
        count(lit(1)).as("_nd2"),
        max(col("_c")).as("_top2"))
    docs.select(col(id),
        size(lines).cast("long").as("n_lines"),
        size(array_distinct(lines)).cast("long").as("n_distinct_lines"))
      .join(gstats, col(id) === gstats("_id"), "left")
      .select(col(id), col("n_lines"), col("n_distinct_lines"),
        coalesce(col("_n2"), lit(0L)).as("n_2grams"),
        coalesce(col("_nd2"), lit(0L)).as("n_distinct_2grams"),
        coalesce(col("_top2"), lit(0L)).as("top_2gram_count"))
  }

  /** Cross-corpus boilerplate removal — the repeated-LINE filter of
    * published corpus-cleaning rules (headers, footers, nav chrome,
    * cookie banners recur verbatim across a site's pages): a
    * non-empty line occurring in more than `maxDocs` DISTINCT
    * documents is dropped from every document; line order and empty
    * lines are preserved. Returns (id, text, n_removed).
    *
    * Plan shape: posexplode lines → per-line distinct-doc count (one
    * partial-aggregable shuffle keyed by line) → join the common-line
    * set back (it is the skewed HEAD of the line distribution —
    * small, AQE broadcasts it) → re-assemble per doc from the
    * surviving (position, line) rows. Nothing is quadratic; the
    * only wide shuffle is the line-count groupBy any df computation
    * needs. */
  def removeBoilerplate(docs: org.apache.spark.sql.DataFrame, maxDocs: Long,
      id: String = "doc_id", text: String = "text"): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(id).as("_id"),
      posexplode(split(col(text), "\n")).as(Seq("_p", "_l")))
    val common = lines.filter(length(col("_l")) > 0)
      .groupBy(col("_l")).agg(count_distinct(col("_id")).as("_docs"))
      .filter(col("_docs") > maxDocs)
      .select(col("_l"))
    val kept = lines.join(common, Seq("_l"), "left_anti")
    val rebuilt = kept.groupBy(col("_id")).agg(
      array_join(transform(array_sort(collect_list(struct(col("_p"), col("_l")))),
        x => x.getField("_l")), "\n").as("_text"),
      count(lit(1)).as("_kept"))
    val total = docs.select(col(id), col(text),
      size(split(col(text), "\n")).cast("long").as("_total"))
    total.join(rebuilt, total(id) === rebuilt("_id"), "left")
      .select(col(id),
        coalesce(col("_text"), lit("")).as(text),
        (col("_total") - coalesce(col("_kept"), lit(0L))).as("n_removed"))
  }

  /** Rotate-xor rolling-hash fingerprint over token xxhashes —
    * order-sensitive (unlike a bag-of-words hash), 64-bit, stable
    * across runs and partitionings. Evaluated as a native codegen
    * kernel (TextNativeFunctions.TokenFingerprint): the equivalent
    * `aggregate(transform(tokens, xxhash64), rotl5-xor)` fold is an
    * interpreted HOF chain that cost 22.9 s on 5,000 documents. */
  def fingerprint(text: Column): Column = call_function("token_fingerprint", text)

  /** Oracle-checkable sibling of [[fingerprint]]: polynomial rolling
    * fold over md5-derived 60-bit token hashes — md5 being the one
    * hash both this engine and the DuckDB oracle implement, the
    * driver can replay the fold exactly (TextNativeFunctions.
    * TokenFingerprintMd5). Same native-kernel execution shape. */
  def fingerprintMd5(text: Column): Column = call_function("token_fingerprint_md5", text)
}
