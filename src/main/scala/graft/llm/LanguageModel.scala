package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistical language-model scoring — the model-free stand-ins
  * for the perplexity filters of published data pipelines (CCNet's
  * KenLM gate; DSIR's importance weights, Xie et al. 2023): a unigram
  * model is just token counts, so both operators are exploded-token
  * groupBys that hold at corpus scale, and both reproduce exactly in
  * the DuckDB oracle (ln() on the round-6 grid, integer counts
  * underneath).
  *
  * Scale contract: ONE tokenization scan; the count table is keyed by
  * token (vocabulary-sized, partial-aggregable); the per-doc score
  * joins tokens → counts on the token key (vocab ≪ corpus, AQE
  * broadcasts when it fits) and the single global-totals row is a
  * deliberate bounded broadcast nested loop (the q_sketch_approx
  * shape). Nothing is quadratic, nothing collects.
  */
object LanguageModel {

  private def toks(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("_id"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))

  /** Per-document cross-entropy under the corpus's own unigram model:
    * xent = −(1/n)·Σ ln(count(t)/total) = ln(total) − Σ ln(count(t))/n,
    * rounded to 6 dp. High values mark documents made of corpus-rare
    * tokens (noise, boilerplate codes, other-language fragments) —
    * the CCNet-style "perplexity bucket" signal with the LM replaced
    * by corpus statistics. The algebraic form on the right is the one
    * both engines evaluate (one ln per DISTINCT token count, no
    * per-token division), mirrored token-for-token in the oracle. */
  def crossEntropy(docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tk = toks(docs, id, text)
    val cnt = tk.groupBy(col("_t")).agg(count(lit(1)).as("_c"))
    val tot = cnt.agg(sum(col("_c")).as("_total"))
    tk.join(cnt, "_t")
      .crossJoin(broadcast(tot))
      .groupBy(col("_id"), col("_total"))
      .agg(count(lit(1)).as("n_tokens"),
        round(log(col("_total")) - sum(log(col("_c"))) / count(lit(1)), 6).as("xent"))
      .select(col("_id").as(id), col("n_tokens"), col("xent"))
  }

  /** CCNet-style perplexity bucketing: per-doc cross-entropy classed
    * into head/middle/tail terciles. The DEFAULT path computes the two
    * cut points as ONE aggregate row (`approx_percentile`, GK sketch —
    * bounded state per partial, merged once), broadcasts it, and
    * buckets every doc by comparison — no global window, no
    * single-partition sort anywhere in the plan, so the operator a
    * user reaches for IS the 100 TB formulation (r12 verdict #1; the
    * reference classes rows against broadcast casual-partition min/max
    * thresholds the same one-row-out way, dbcon/joblist/lbidlist.h:82-117).
    * `exact = true` swaps the sketch for exact discrete percentiles
    * (`percentile_disc`: smallest value with cume_dist ≥ p, the
    * ceil(p·n)-th smallest — DuckDB's quantile_disc definition, so the
    * gate hash-compares it; buffer is a value→count histogram, bounded
    * by the 6-dp xent grid, still one row out). Same plan shape either
    * way; only the threshold aggregate differs. Ties share a bucket by
    * construction (threshold compare), which is also why no tiebreak
    * column is needed for determinism. */
  def perplexityBuckets(docs: DataFrame, exact: Boolean = false,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val ce = crossEntropy(docs, id, text)
    val th =
      if (exact) ce.agg(
        expr("percentile_disc(CAST(1 AS DOUBLE)/3) WITHIN GROUP (ORDER BY xent)").as("_t1"),
        expr("percentile_disc(CAST(2 AS DOUBLE)/3) WITHIN GROUP (ORDER BY xent)").as("_t2"))
      else ce.agg(
        percentile_approx(col("xent"), lit(1.0 / 3), lit(10000)).as("_t1"),
        percentile_approx(col("xent"), lit(2.0 / 3), lit(10000)).as("_t2"))
    ce.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("xent") <= col("_t1"), lit("head"))
          .when(col("xent") <= col("_t2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(id), col("n_tokens"), col("xent"), col("bucket"))
  }

  /** Top-`size` corpus vocabulary by (count DESC, term ASC) — the
    * frequency-cut vocabulary induction every tokenizer fit starts
    * from. orderBy+limit plans as TakeOrderedAndProject (distributed
    * partial top-k, driver holds only `size` rows) — NOT a global
    * window, which would single-partition a vocabulary that at corpus
    * scale runs to 10⁸ distinct terms. */
  def vocabulary(docs: DataFrame, size: Int,
      id: String = "doc_id", text: String = "text"): DataFrame =
    toks(docs, id, text)
      .groupBy(col("_t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("_t"))
      .limit(size)
      .select(col("_t").as("term"), col("cnt"))

  /** Per-document out-of-vocabulary profile vs the top-`vocabSize`
    * corpus vocabulary: (id, n_tokens, n_oov) — all integers, so the
    * oracle replays it exactly. The vocab side is bounded by
    * `vocabSize` and broadcasts; token-less docs report (0, 0). */
  def oovProfile(docs: DataFrame, vocabSize: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val v = vocabulary(docs, vocabSize, id, text).select(col("term"))
    val tk = toks(docs, id, text)
    val prof = tk.join(broadcast(v.withColumn("_in", lit(1))),
        tk("_t") === v("term"), "left")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(id)).join(prof, col(id) === prof("_id"), "left")
      .select(col(id), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Per-group KL divergence KL(p_group ‖ p_corpus) over unigram
    * distributions — the mixture-audit statistic (how far each
    * source's token distribution sits from the blend it feeds).
    * No smoothing needed: every group token exists in the corpus, so
    * p_corpus > 0 wherever p_group > 0, and absent tokens contribute
    * exactly 0. One token pass: (group, token) counts + token counts +
    * group totals + the 1-row corpus total (bounded broadcast).
    * Output (group, n_tokens, kl) on the round-6 grid. */
  def sourceDivergence(docs: DataFrame, group: String = "source",
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tk = docs.select(col(group).as("_g"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))
    val st = tk.groupBy(col("_g"), col("_t")).agg(count(lit(1)).as("_cst"))
    val ct = st.groupBy(col("_t")).agg(sum(col("_cst")).as("_ct"))
    val ns = st.groupBy(col("_g")).agg(sum(col("_cst")).as("_ns"))
    val g = ct.agg(sum(col("_ct")).as("_n"))
    val term = (col("_cst") / col("_ns")) *
      log((col("_cst") / col("_ns")) / (col("_ct") / col("_n")))
    st.join(ct, "_t").join(ns, "_g")
      .crossJoin(broadcast(g))
      .groupBy(col("_g"), col("_ns"))
      .agg(round(sum(term), 6).as("kl"))
      .select(col("_g").as(group), col("_ns").as("n_tokens"), col("kl"))
  }

  /** Per-document cross-entropy under an add-one-smoothed BIGRAM
    * model of the corpus — one Markov step closer to the KenLM gate
    * than [[crossEntropy]]: p(t|prev) = (c(prev,t)+1)/(c(prev)+V),
    * xent_bi = (1/nb)·Σ [ln(c(prev)+V) − ln(c(prev,t)+1)] over a
    * document's nb = n−1 bigrams. Docs with < 2 tokens have no
    * bigrams and are absent (a fluency score needs context to score).
    *
    * ONE bigram explode feeds both the count table (groupBy(prev,t),
    * partial-aggregable) and the per-doc scoring join; unigram counts
    * and |V| ride the token pass [[crossEntropy]] already needs.
    * Output (id, n_bigrams, xent_bi) on the round-6 grid. */
  /** Interpolated TRIGRAM cross-entropy — the next KenLM-gate rung
    * after [[bigramCrossEntropy]] (Jelinek-Mercer interpolation, the
    * published fixed-weight variant):
    *
    *   p(c | a,b) = λ3·c(abc)/c(ab) + λ2·c(bc)/c(b) + λ1·(c(c)+1)/(N+V)
    *
    * Scoring corpus = training corpus, so every numerator is ≥ 1 and
    * the model needs no backoff machinery; the add-one unigram floor
    * keeps p < 1 strictly positive. Three count tables fall out of the
    * same token pass (unigram, bigram, trigram — each one
    * partial-aggregable shuffle); scoring joins each trigram to its
    * three contexts and folds −Σ ln p / n per document. Output
    * (id, n_trigrams, xent_tri) rounded to 6 dp. */
  def trigramCrossEntropy(docs: DataFrame,
      id: String = "doc_id", text: String = "text",
      l3: Double = 0.6, l2: Double = 0.3, l1: Double = 0.1): DataFrame = {
    val ts = TextAnalysis.tokens(lower(col(text)))
    val base = docs.select(col(id).as("_id"), ts.as("_ts"))
    val tri = base.filter(size(col("_ts")) >= 3)
      .select(col("_id"), explode(transform(sequence(lit(0), size(col("_ts")) - 3),
        i => struct(col("_ts").getItem(i).as("a"),
          col("_ts").getItem(i + 1).as("b"),
          col("_ts").getItem(i + 2).as("c")))).as("_g"))
      .select(col("_id"), col("_g.a").as("_a"), col("_g.b").as("_b"),
        col("_g.c").as("_c"))
    val bi = base.filter(size(col("_ts")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("_ts")) - 2),
        i => struct(col("_ts").getItem(i).as("p"),
          col("_ts").getItem(i + 1).as("c")))).as("_g"))
      .select(col("_g.p").as("_p"), col("_g.c").as("_q"))
    val c3 = tri.groupBy(col("_a"), col("_b"), col("_c")).agg(count(lit(1)).as("_c3"))
    val c2 = bi.groupBy(col("_p"), col("_q")).agg(count(lit(1)).as("_c2"))
    val cu = toks(docs, id, text).groupBy(col("_t")).agg(count(lit(1)).as("_cu"))
    val nv = cu.agg(sum(col("_cu")).as("_n"), count(lit(1)).as("_v"))
    val p =
      lit(l3) * col("_c3") / col("_cab") +
        lit(l2) * col("_cbc") / col("_cb") +
        lit(l1) * (col("_cuc") + 1.0) / (col("_n") + col("_v"))
    tri
      .join(c3, Seq("_a", "_b", "_c"))
      .join(c2.select(col("_p").as("_a"), col("_q").as("_b"), col("_c2").as("_cab")),
        Seq("_a", "_b"))
      .join(c2.select(col("_p").as("_b"), col("_q").as("_c"), col("_c2").as("_cbc")),
        Seq("_b", "_c"))
      .join(cu.select(col("_t").as("_b"), col("_cu").as("_cb")), "_b")
      .join(cu.select(col("_t").as("_c"), col("_cu").as("_cuc")), "_c")
      .crossJoin(broadcast(nv))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(-sum(log(p)) / count(lit(1)), 6).as("xent_tri"))
      .select(col("_id").as(id), col("n_trigrams"), col("xent_tri"))
  }

  /** Per-document cross-entropy under an interpolated KNESER-NEY
    * bigram model — the smoothing KenLM actually ships (Kneser & Ney
    * 1995; Chen & Goodman 1999 empirical study), i.e. the real CCNet
    * perplexity-gate arithmetic rather than the add-one/JM stand-ins:
    *
    *   p_KN(c|p) = ( max(c(p,c) − D, 0) + D·N1+(p,·)·p_cont(c) ) / c(p)
    *   p_cont(c) = N1+(·,c) / |{distinct bigrams}|
    *
    * with fixed discount D (0.75, the Chen-Goodman default). The
    * continuation probability p_cont weighs a word by how many
    * DISTINCT contexts it follows, not raw frequency — the KN insight
    * that demotes "Francisco" (frequent, one context) below "the".
    * Scoring corpus = training corpus, so every scored bigram has
    * c(p,c) ≥ 1 and the discounted term plus the backoff mass keep
    * p strictly inside (0,1).
    *
    * Scale shape: ONE bigram explode; every model statistic (c(p,c),
    * c(p), N1+(p,·), N1+(·,c), |bigrams|) is an integer aggregate
    * over the bigram-count table — 4 partial-aggregable shuffles of
    * vocab²-bounded (not corpus-bounded) rows; scoring re-joins the
    * doc bigrams to the broadcast-or-shuffled count tables. Output
    * (id, n_bigrams, xent_kn) rounded to 6 dp. */
  def kneserNeyCrossEntropy(docs: DataFrame,
      id: String = "doc_id", text: String = "text",
      discount: Double = 0.75): DataFrame = {
    val ts = TextAnalysis.tokens(lower(col(text)))
    val bi = docs.select(col(id).as("_id"), ts.as("_ts"))
      .filter(size(col("_ts")) >= 2)
      .select(col("_id"), explode(transform(sequence(lit(0), size(col("_ts")) - 2),
        i => struct(col("_ts").getItem(i).as("p"), col("_ts").getItem(i + 1).as("c"))))
        .as("_b"))
      .select(col("_id"), col("_b.p").as("_p"), col("_b.c").as("_c"))
    val c2 = bi.groupBy(col("_p"), col("_c")).agg(count(lit(1)).as("_c2"))
    val byP = c2.groupBy(col("_p"))
      .agg(sum(col("_c2")).as("_cp"), count(lit(1)).as("_n1p"))
    val byC = c2.groupBy(col("_c")).agg(count(lit(1)).as("_n1c"))
    val bTot = c2.agg(count(lit(1)).as("_bt"))
    // spelled in the exact operand order the oracle uses so the two
    // engines compute bit-identical doubles before the 6 dp grid
    val p = (greatest(col("_c2") - lit(discount), lit(0.0)) +
      lit(discount) * col("_n1p") * col("_n1c") / col("_bt")) / col("_cp")
    bi.join(c2, Seq("_p", "_c"))
      .join(byP, "_p")
      .join(byC, "_c")
      .crossJoin(broadcast(bTot))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log(p)) / count(lit(1)), 6).as("xent_kn"))
      .select(col("_id").as(id), col("n_bigrams"), col("xent_kn"))
  }

  def bigramCrossEntropy(docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val ts = TextAnalysis.tokens(lower(col(text)))
    val bi = docs.select(col(id).as("_id"), ts.as("_ts"))
      .filter(size(col("_ts")) >= 2)
      .select(col("_id"), explode(transform(sequence(lit(0), size(col("_ts")) - 2),
        i => struct(col("_ts").getItem(i).as("p"), col("_ts").getItem(i + 1).as("c"))))
        .as("_b"))
      .select(col("_id"), col("_b.p").as("_p"), col("_b.c").as("_c"))
    val cb = bi.groupBy(col("_p"), col("_c")).agg(count(lit(1)).as("_cb"))
    val tk = toks(docs, id, text)
    val cu = tk.groupBy(col("_t")).agg(count(lit(1)).as("_cu"))
    val v = cu.agg(count(lit(1)).as("_v"))
    val term = log(col("_cu") + col("_v")) - log(col("_cb") + lit(1.0))
    bi.join(cb, Seq("_p", "_c"))
      .join(cu.withColumnRenamed("_t", "_p"), "_p")
      .crossJoin(broadcast(v))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(term) / count(lit(1)), 6).as("xent_bi"))
      .select(col("_id").as(id), col("n_bigrams"), col("xent_bi"))
  }

  /** DSIR-style importance log-weights: per document, the mean over
    * its tokens of ln p̂_target(t) − ln p̂_raw(t), where both unigram
    * models are add-one smoothed over the RAW vocabulary
    * (p̂(t) = (c(t)+1)/(total+|V|)). `targetPred` selects the target
    * rows (e.g. a trusted source) out of `docs` itself. Positive
    * weight ⇒ the document looks more like the target than the raw
    * corpus — the resampling key of importance-weighted data
    * selection. Output (id, n_tokens, logw) rounded to 6 dp. */
  def importanceWeights(docs: DataFrame, targetPred: Column,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tk = docs.select(col(id).as("_id"), targetPred.as("_tgt"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_t"))
    // one pass produces BOTH models: raw count + target-slice count
    val v = tk.groupBy(col("_t")).agg(
      count(lit(1)).as("_cr"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"))
    val g = v.agg(sum(col("_cr")).as("_totr"), sum(col("_ct")).as("_tott"),
      count(lit(1)).as("_vocab"))
    val termW =
      log((col("_ct") + lit(1.0)) / (col("_tott") + col("_vocab"))) -
        log((col("_cr") + lit(1.0)) / (col("_totr") + col("_vocab")))
    tk.join(v, "_t")
      .crossJoin(broadcast(g))
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(termW) / count(lit(1)), 6).as("logw"))
      .select(col("_id").as(id), col("n_tokens"), col("logw"))
  }

  // ---- BPE merge induction (tokenizer training) ----

  /** Word-frequency table with each word as its initial symbol array
    * (single characters) — the working set of BPE training. All later
    * rounds operate on DISTINCT words weighted by frequency, so the
    * corpus is tokenized exactly once and the iterated table is
    * vocabulary-sized, not corpus-sized. */
  private def symbolWords(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(lower(col(text)))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .select(filter(split(col("_w"), ""), s => length(s) > 0).as("_syms"),
        col("_f"))

  /** Frequency-weighted adjacent-symbol-pair counts of a symbolized
    * word table — one BPE training round's statistics. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("_syms")) >= 2)
      .select(col("_f"), explode(
        transform(sequence(lit(1), size(col("_syms")) - 1),
          i => struct(element_at(col("_syms"), i).as("l"),
            element_at(col("_syms"), i + 1).as("r")))).as("_p"))
      .groupBy(col("_p.l").as("left"), col("_p.r").as("right"))
      .agg(sum(col("_f")).as("freq"))

  /** First-round BPE pair statistics over the corpus — the
    * SQL-expressible slice of [[bpeMerges]], exposed so the training
    * loop's input distribution has a direct DuckDB oracle. */
  def bpePairStats(docs: DataFrame, text: String = "text"): DataFrame =
    pairCounts(symbolWords(docs, text))

  /** Greedy left-to-right application of ONE merge (l, r) to a symbol
    * array: the fold's accumulator tail is compared by symbol
    * CONTENT, exact because initial symbols are single chars — a
    * merged symbol (≥ 2 chars) can shadow only other merge products,
    * the standard BPE identification of symbols with their strings.
    * `get` (not element_at) keeps the empty-accumulator probe
    * null-safe under ANSI. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** BPE merge-table induction (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"): `numMerges`
    * rounds of [count adjacent symbol pairs weighted by word
    * frequency → merge the most frequent pair everywhere], ties
    * broken (freq DESC, left ASC, right ASC) so the table is
    * deterministic across runs and partitionings. Returns
    * (rank, left, right, freq) — the merge list a tokenizer replays.
    *
    * Scale shape: the corpus is scanned ONCE (word-frequency rollup);
    * every round then aggregates the vocabulary-sized symbol table —
    * a partial-aggregable groupBy — and collects exactly one row (the
    * argmax pair; same bounded-driver-state class as the k-means
    * centroid collect). The merge application is a per-row greedy
    * left-to-right `aggregate` fold over each word's symbols — no
    * shuffle, no quadratic step. Rounds persist their output and
    * release the previous cache (the dupClusters discipline), so
    * lineage stays O(1) per round.
    *
    * Cost note: one action per merge round means production merge
    * counts (30k+) are scheduling-bound — use [[bpeMergesSampled]]
    * there; this full trainer is the exact baseline it is specced
    * against. */
  def bpeMerges(docs: DataFrame, numMerges: Int,
      text: String = "text"): DataFrame = {
    require(numMerges >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE action per round: the argmax collect itself materializes the
    // round's persisted symbol table (reading the previous round's
    // cache), so no separate count() job is spent pinning caches —
    // the previous cache is released only AFTER that action has run.
    var words = symbolWords(docs, text).persist()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val best = pairCounts(words)
          .orderBy(col("freq").desc, col("left"), col("right"))
          .limit(1).collect() // materializes `words`
        if (prev ne null) { prev.unpersist(blocking = false); prev = null }
        if (best.isEmpty) exhausted = true // every word is one symbol
        else {
          val (l, r, c) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += ((rank, l, r, c))
          prev = words
          words = words.select(applyMerge(col("_syms"), l, r).as("_syms"),
            col("_f")).persist()
          rank += 1
        }
      }
    } finally {
      if (prev ne null) prev.unpersist(blocking = false)
      words.unpersist(blocking = false)
    }
    spark.createDataset(merges.result())
      .toDF("rank", "left", "right", "freq")
  }

  /** Sampled-corpus BPE training — the production-scale variant of
    * [[bpeMerges]]. The full trainer's cost model is one driver action
    * per merge round; at production merge counts (30k–50k) that is a
    * scheduling-bound job regardless of cluster size. The published
    * compromise (used by the SentencePiece/GPT-2 lineage of tokenizer
    * trainers) is to train on a corpus SAMPLE: subword statistics are
    * heavy-tailed, so a deterministic uniform document sample of a few
    * percent preserves the high-frequency pair ranking that early
    * merges (the ones every token passes through) are built from,
    * while cutting the per-round aggregate input by 1/fraction.
    *
    * The sample is `Sampling.uniformSample` on the id column — an
    * md5-threshold codegen filter at the scan, deterministic across
    * runs/executors/restarts, so the trained table is reproducible.
    * Divergence vs the full trainer appears only in the tail ranks
    * where pair frequencies approach the sampling noise floor;
    * LlmSpec asserts head-rank agreement on a planted corpus. */
  def bpeMergesSampled(docs: DataFrame, numMerges: Int, fraction: Double,
      id: String = "doc_id", text: String = "text",
      salt: String = "bpe"): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    bpeMerges(Sampling.uniformSample(docs, id, fraction, salt), numMerges, text)
  }

  /** Tokenize with a TRAINED merge list: replay `merges` in rank
    * order over each distinct word, then count subword usage per
    * document. This is the inference half of [[bpeMerges]] — the
    * learned-subword token accounting a batch-size/cost planner runs
    * over a 100 TB corpus.
    *
    * Scale shape: segmentation happens once per DISTINCT word (the
    * vocabulary-sized table; |merges| nested folds collapse into one
    * projection over it), and the corpus joins to it on the word key
    * — broadcast when the vocabulary fits, shuffle-hash otherwise.
    * The corpus itself is tokenized exactly once and never carries
    * symbol arrays through a shuffle. */
  def bpeSegment(docs: DataFrame, merges: Seq[(String, String)],
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val toksed = docs.select(col(id).as("_id"),
      explode(TextAnalysis.tokens(lower(col(text)))).as("_w"))
    val seg = merges.foldLeft(
      toksed.select(col("_w")).distinct()
        .withColumn("_syms", filter(split(col("_w"), ""), s => length(s) > 0))) {
      case (df, (l, r)) => df.withColumn("_syms", applyMerge(col("_syms"), l, r))
    }
    toksed.join(seg, "_w")
      .select(col("_id"), explode(col("_syms")).as("subword"))
      .groupBy(col("_id"), col("subword")).agg(count(lit(1)).as("cnt"))
  }

  // ---- unigram-LM tokenizer (SentencePiece-style; Kudo 2018) ----

  /** Train a unigram-LM piece vocabulary by EM over the word lattice
    * — the OTHER published subword-tokenizer family next to [[bpeMerges]]
    * (BPE grows pieces bottom-up; unigram starts from a large substring
    * candidate set and prunes by likelihood).
    *
    * Scale shape: candidates seed from one flatMap over the DISTINCT
    * word table (vocabulary-sized, not corpus-sized) with a top-k cut;
    * each EM round is ONE distributed pass — per-word forward/backward
    * expected counts against a BROADCAST piece table, partial-
    * aggregable sum keyed by piece — and only the vocab-sized count
    * table crosses to the driver for the M-step renormalize (the same
    * metadata-sized collect contract as the IVF centroid pull).
    * Single-character pieces are never pruned (full coverage by
    * construction).
    *
    * @return (piece, logp) rows, vocabSize largest by probability
    */
  def unigramTrain(docs: DataFrame, vocabSize: Int, emRounds: Int = 2,
      maxPieceLen: Int = 6, maxCandidates: Int = 4000,
      text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextAnalysis.tokens(lower(col(text)))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .as[(String, Long)].persist()
    // candidate substrings weighted by word frequency, top-k by mass
    val cand = words.flatMap { case (w, n) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), n)
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .toDF("piece", "mass")
      .orderBy(col("mass").desc, col("piece")).limit(maxCandidates)
      .as[(String, Long)].collect()
    val chars = cand.filter(_._1.length == 1).map(_._1).toSet
    val total = cand.map(_._2.toDouble).sum
    var probs: Map[String, Double] = cand.map { case (p, m) => p -> m / total }.toMap
    for (_ <- 1 to emRounds) {
      val bc = spark.sparkContext.broadcast(probs)
      val expected = words.flatMap { case (w, n) =>
        val v = bc.value
        val len = w.length
        val alpha = new Array[Double](len + 1)
        val beta = new Array[Double](len + 1)
        alpha(0) = 1.0; beta(len) = 1.0
        for (j <- 1 to len; i <- math.max(0, j - maxPieceLen) until j)
          v.get(w.substring(i, j)).foreach(p => alpha(j) += alpha(i) * p)
        for (i <- (len - 1) to 0 by -1; j <- (i + 1) to math.min(len, i + maxPieceLen))
          v.get(w.substring(i, j)).foreach(p => beta(i) += p * beta(j))
        val z = alpha(len)
        if (z <= 0) Iterator.empty
        else for {
          i <- (0 until len).iterator
          j <- ((i + 1) to math.min(len, i + maxPieceLen)).iterator
          p <- v.get(w.substring(i, j)).iterator
        } yield (w.substring(i, j), n * alpha(i) * p * beta(j) / z)
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).collect()
      bc.destroy()
      val z = expected.map(_._2).sum
      if (z > 0) probs = expected.map { case (p, c) => p -> c / z }.toMap
    }
    words.unpersist()
    // prune to vocabSize, single chars always survive
    val (keepChars, multi) = probs.toSeq.partition { case (p, _) => p.length == 1 }
    val kept = keepChars ++
      multi.sortBy { case (p, pr) => (-pr, p) }
        .take(math.max(0, vocabSize - chars.size))
    val zk = kept.map(_._2).sum
    spark.createDataFrame(kept.map { case (p, pr) =>
      (p, math.log(pr / zk))
    }).toDF("piece", "logp")
  }

  /** Segment each doc's (lowercased, space→'_', optionally truncated)
    * text with a piece vocabulary. `greedy = true` takes the LONGEST
    * matching piece at each position (deterministic, SQL-replayable —
    * the driver-checked mode); `greedy = false` runs the Viterbi DP
    * maximizing Σ logp (the unigram-LM decode; ties prefer the longer
    * last piece). Characters absent from the vocabulary fall back to
    * single-char pieces at `oovLogp`. One broadcast + one map — no
    * shuffle. */
  def unigramSegment(docs: DataFrame, vocab: Map[String, Double],
      greedy: Boolean = false, maxLen: Int = 0, oovLogp: Double = -100.0,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxPiece = if (vocab.isEmpty) 1 else vocab.keys.map(_.length).max
    val bc = spark.sparkContext.broadcast(vocab)
    val prepped = docs.select(col(id).cast("long").as("_id"),
      regexp_replace(lower(col(text)), " ", "_").as("_s"))
    val capped = if (maxLen > 0)
      prepped.withColumn("_s", substring(col("_s"), 1, maxLen)) else prepped
    capped.as[(Long, String)].map { case (docId, s) =>
      val v = bc.value
      val pieces = Seq.newBuilder[String]
      if (greedy) {
        var pos = 0
        while (pos < s.length) {
          var l = math.min(maxPiece, s.length - pos)
          while (l > 1 && !v.contains(s.substring(pos, pos + l))) l -= 1
          val piece = s.substring(pos, pos + l)
          pieces += piece // l == 1 falls back to the raw char
          pos += l
        }
      } else {
        val n = s.length
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val back = new Array[Int](n + 1)
        best(0) = 0.0
        for (j <- 1 to n; i <- math.max(0, j - maxPiece) until j) {
          val piece = s.substring(i, j)
          val lp =
            if (v.contains(piece)) v(piece)
            else if (j - i == 1) oovLogp
            else Double.NegativeInfinity
          val cand = best(i) + lp
          // >= : equal scores prefer the LONGER last piece (smaller i)
          if (cand > best(j) || (cand == best(j) && i < back(j))) {
            best(j) = cand; back(j) = i
          }
        }
        var j = n
        val rev = List.newBuilder[String]
        while (j > 0) { rev += s.substring(back(j), j); j = back(j) }
        pieces ++= rev.result().reverse
      }
      val out = pieces.result()
      (docId, out.mkString("|"), out.size)
    }.toDF(id, "pieces", "n_pieces")
  }
}
