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
}
