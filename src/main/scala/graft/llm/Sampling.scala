package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the TABLESAMPLE analog a
  * training-data pipeline actually wants: samples must be
  * REPRODUCIBLE (rerunning the pipeline yields the same subset,
  * regardless of partitioning or cluster size), so membership is a
  * pure function of the row key, never of RNG state or task order.
  *
  * Mechanism: compare a fixed-width prefix of md5(key) against a
  * threshold. The digest prefix is uniform on [0, 16^8), so
  * P(keep) = fraction to within 2^-32; membership is decided
  * per-row inside the scan (codegen'd, pushdown-friendly, no
  * shuffle). Different `salt`s give independent samples — the
  * train/validation split knob.
  */
object Sampling {

  /** Hex-prefix threshold for `fraction`: keep iff
    * substr(md5(key),1,8) < threshold. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    f"${math.round(fraction * 4294967296.0).min(4294967295L)}%08x"
  }

  /** Membership predicate: deterministic `fraction`-sample on `key`. */
  def sampleHash(key: Column, fraction: Double, salt: String = ""): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) <
      lit(hexThreshold(fraction))

  /** Uniform deterministic sample of `fraction` of `df` keyed on
    * `keyCol`. One codegen'd filter on the scan — no shuffle, no
    * state, safe at any scale. */
  def uniformSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(sampleHash(col(keyCol), fraction, salt))

  /** Per-stratum keep rates for temperature-flattened sampling:
    * stratum i's share of the sampled corpus ∝ (n_i)^alpha (the
    * multilingual-LM mixture rule — alpha < 1 flattens head strata,
    * boosting the tail), scaled so the expected kept total is
    * `targetFrac` of the input; rates clip at 1 (a filter cannot
    * upsample — the clipped stratum contributes everything it has).
    * Computed as a vocabulary-sized aggregate joined to a 1-row
    * global (N, Z) — no collect, broadcast-joined back to the scan.
    * Exposed separately so callers (and tests) can audit the rates. */
  def temperatureRates(df: DataFrame, stratumCol: String, alpha: Double,
      targetFrac: Double): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    // N is a sum of exact integers (order-free in double); Z sums
    // IRRATIONAL pow terms, so it folds in sorted-stratum order —
    // bit-reproducible here and in the replaying oracle, independent
    // of partitioning (a plain SUM's addition order is not)
    val tot = counts.agg(sum(col("_n")).as("_tot"),
      aggregate(array_sort(collect_list(struct(col(stratumCol).as("s"),
          pow(col("_n"), lit(alpha)).as("p")))),
        lit(0.0), (a, x) => a + x.getField("p")).as("_z"))
    counts.crossJoin(broadcast(tot)).select(col(stratumCol),
      least(lit(1.0), lit(targetFrac) * col("_tot") * pow(col("_n"), lit(alpha))
        / (col("_z") * col("_n"))).as("_rate"))
  }

  /** Temperature sampling: deterministic md5-membership like
    * `mixtureSample`, but the per-stratum fraction is DERIVED from
    * the stratum counts by the alpha rule above rather than supplied.
    * Membership compares the key digest prefix (as an integer)
    * against floor(rate·2^32) — the arithmetic an independent engine
    * reproduces exactly (IEEE doubles, same op order; the DuckDB
    * oracle replays it term for term). Plan: one aggregate for the
    * rates, then a broadcast join back — each row still decides
    * membership inside its scan. */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: String,
      alpha: Double = 0.7, targetFrac: Double = 0.5,
      salt: String = ""): DataFrame = {
    val keyHash = conv(substring(md5(concat(col(keyCol).cast("string"),
      lit(salt))), 1, 8), 16, 10).cast("long")
    df.join(broadcast(temperatureRates(df, stratumCol, alpha, targetFrac)),
        stratumCol)
      .filter(keyHash < floor(col("_rate") * lit(4294967296.0)).cast("long"))
      .drop("_rate")
  }

  /** Mixture (per-domain-weighted) deterministic sample — the
    * training-mixture knob: each stratum keeps its OWN fraction
    * (e.g. up-weight curated sources, down-weight crawl). Membership
    * stays a pure per-row function of (key, salt) compared against
    * the stratum's threshold, so the plan is still one codegen'd
    * scan filter — no shuffle, no per-stratum pass; changing one
    * domain's weight re-decides only that domain's rows (nested
    * samples per stratum, same property as `uniformSample`). Strata
    * absent from `weights` keep `defaultFraction`. */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
      weights: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one stratum")
    weights.values.foreach(f => require(f >= 0 && f <= 1, "fractions must be in [0,1]"))
    // sorted for a deterministic plan (Map order is not)
    val cases = weights.toSeq.sortBy(_._1)
    val threshold = cases.tail
      .foldLeft(when(col(stratumCol) === cases.head._1, lit(hexThreshold(cases.head._2)))) {
        case (acc, (stratum, f)) => acc.when(col(stratumCol) === stratum, lit(hexThreshold(f)))
      }
      .otherwise(lit(hexThreshold(defaultFraction)))
    df.filter(substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8) < threshold)
  }

  /** Token-BUDGET sample: per stratum, keep documents — in the
    * deterministic md5(key) pseudo-random order — until the stratum's
    * cumulative token count would exceed `budgetTokens` — prefix
    * semantics: the sample is the longest prefix of the stratum's
    * deterministic order whose token sum fits the budget (the first
    * overflowing doc and everything after it are cut; delivered
    * tokens land within one document of the target, which is the
    * practical contract). This is how training mixtures are actually
    * specified in practice — "N tokens of source X", not "fraction f
    * of documents" — and doc-fraction sampling can't hit a token
    * target when document lengths are skewed.
    *
    * One shuffle (window by stratum, the prefix sum); reruns are
    * byte-identical (order is a pure function of keys), and raising
    * the budget only ADDS documents — nested samples, the same
    * property as `uniformSample`'s threshold monotonicity. */
  /** Data-constrained mixing plan (the repeat-epochs question of
    * Muennighoff et al. 2023): given a total token budget, allocate it
    * across sources ∝ n^alpha (the same flattening rule as
    * [[temperatureRates]]) and convert each source's allocation into
    * EPOCHS over its corpus, capped at `maxEpochs` (returns diminish
    * fast past ~4 repeats — the published guidance). Output per
    * source: token count, allocation, epochs, and the effective
    * (budget-consuming) tokens after the cap.
    *
    * One token-count aggregate + a 1-row broadcast normalizer; the
    * Σ n^alpha fold runs in sorted-source order so the plan is
    * bit-reproducible (same trick as temperatureRates). */
  def epochAllocation(df: DataFrame, stratumCol: String, textCol: String,
      budgetTokens: Long, alpha: Double = 0.5,
      maxEpochs: Double = 4.0): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).cast("double").as("_n"))
    val z = counts.agg(
      aggregate(array_sort(collect_list(struct(col(stratumCol).as("s"),
          pow(col("_n"), lit(alpha)).as("p")))),
        lit(0.0), (a, x) => a + x.getField("p")).as("_z"))
    counts.crossJoin(broadcast(z))
      .select(
        col(stratumCol),
        col("_n").cast("long").as("n_tokens"),
        (lit(budgetTokens) * pow(col("_n"), lit(alpha)) / col("_z")).as("_alloc"))
      .select(
        col(stratumCol), col("n_tokens"),
        floor(col("_alloc")).cast("long").as("alloc_tokens"),
        least(lit(maxEpochs), col("_alloc") / col("n_tokens")).as("_epochs"))
      .select(col(stratumCol), col("n_tokens"), col("alloc_tokens"),
        floor(col("_epochs") * 1000).cast("long").as("epochs_milli"),
        floor(col("_epochs") * col("n_tokens")).cast("long")
          .as("effective_tokens"))
  }

  /** Deterministic weighted sampling WITHOUT replacement — the
    * Efraimidis–Spirakis reservoir rule (key = u^(1/w), keep the
    * top-k keys), with the uniform u derived from md5 like every
    * sampler here, so the draw is a pure function of (id, salt):
    * reproducible across runs, partitionings and engines.
    *
    *   u_i ∈ (0,1]  = (h_i + 1) / 2^52,  h_i = first 13 md5 hex chars
    *   rank by ln(u_i)/w_i DESC (monotone in u^(1/w); id tie-break)
    *
    * Heavier rows draw proportionally more often (P(i in sample)
    * approaches k·w_i/Σw for small k) — the published rule for
    * quality- or length-weighted corpus subsetting.
    *
    * Scale shape: one codegen'd key projection on the scan + one
    * bounded per-group window (rows ≤ k ship per group after the
    * partial top-k; swap in `top_k_per_group` for the heap-aggregate
    * formulation when groups are few and huge). Zero weight → key
    * -inf: never sampled while any positive-weight row remains. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, groupCols: Seq[String] = Nil, salt: String = ""): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))),
      1, 13), 16, 10).cast("long")
    val u = (h + 1).cast("double") / lit(4503599627370496.0) // 2^52
    // explicit -inf for non-positive weights (ANSI mode errors on /0)
    val key = when(col(weightCol) > 0,
      log(u) / col(weightCol).cast("double"))
      .otherwise(lit(Double.NegativeInfinity))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(key.desc, col(idCol))
    df.withColumn("_es_key", key)
      .withColumn("_es_rank", row_number().over(w))
      .filter(col("_es_rank") <= k)
      .drop("_es_key", "_es_rank")
  }

  def tokenBudgetSample(df: DataFrame, stratumCol: String, keyCol: String,
      budgetTokens: Long, text: String = "text", salt: String = ""): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    val digest = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(digest, col(keyCol))
    df.withColumn("_nt", TextAnalysis.tokenCount(col(text)).cast("long"))
      .withColumn("_cum", sum(col("_nt")).over(w))
      .filter(col("_cum") <= budgetTokens)
      .drop("_nt", "_cum")
  }

  /** Disjoint, exhaustive train/validation/test split: the md5(key)
    * unit interval is carved into consecutive bands, one per split in
    * the given order, so every row lands in EXACTLY one split, the
    * assignment is a pure per-row function of (key, salt) — codegen'd
    * scan expression, no shuffle — and resizing a band moves only the
    * rows across the one shared boundary (stable splits as ratios are
    * tuned). Leakage control is the choice of key: key on a GROUP
    * column (site, conversation, author) and every row of the group
    * shares a digest, landing in the same split. Returns `df` plus a
    * `split` column. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    splits.foreach { case (_, f) => require(f >= 0 && f <= 1, "fractions in [0,1]") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val digest = substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8)
    val uppers = splits.scanLeft(0.0)(_ + _._2).tail // cumulative band bounds
    val assign = splits.zip(uppers).init
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        val cond = digest < lit(hexThreshold(hi))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
      }
      .map(_.otherwise(lit(splits.last._1))).get
    df.withColumn("split", assign)
  }

  /** Deterministic global shuffle — the reproducible training-order
    * op: every epoch's order is a pure function of (key, salt), so a
    * rerun (or a resumed job) sees byte-identical order at any
    * cluster size, and each epoch's salt gives an independent
    * permutation. A total order costs exactly one range-partitioned
    * sort — the minimum any global order can cost — and the emitted
    * `_shuffle_key` lets downstream stages re-verify or re-establish
    * the order without re-sorting blindly. */
  def deterministicShuffle(df: DataFrame, keyCol: String, salt: String = ""): DataFrame =
    df.withColumn("_shuffle_key", md5(concat(col(keyCol).cast("string"), lit(salt))))
      .orderBy(col("_shuffle_key"), col(keyCol))

  /** Stratified deterministic sample: EXACTLY ceil(fraction · |stratum|)
    * rows per stratum (uniform sampling leaves stratum sizes
    * binomially distributed; quota work wants them pinned). Rows are
    * ranked inside each stratum by md5(key) — a deterministic
    * pseudo-random order — and the top quota kept. One shuffle
    * (window by stratum); skewed strata rely on the same AQE
    * machinery as any other window. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      fraction: Double, salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val digest = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(digest, col(keyCol))
    val cw = Window.partitionBy(col(stratumCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_cnt", count(lit(1)).over(cw))
      .filter(col("_rn") <= ceil(lit(fraction) * col("_cnt")).cast("long"))
      .drop("_rn", "_cnt")
  }

  /** Curriculum ordering: equi-depth difficulty buckets over an
    * integer score (tie-broken by `keyCol` into a UNIQUE composite
    * rank key), round-robin interleaved — easy→hard cycles so every
    * training window sees the full difficulty mix (the anti-sorted
    * schedule curriculum-learning work prescribes). Output adds
    * `bucket` (0-based) and `pos` (1-based rank within bucket);
    * train order = ORDER BY (pos, bucket).
    *
    * Exactness: bucket boundaries are percentile_disc values of the
    * unique composite — deterministic, oracle-replayable (DuckDB
    * quantile_disc, the q_agg_pctdisc-proven pairing); strict-less
    * counting is unambiguous because the composite never ties.
    *
    * Scale: thresholds are ONE 1-row sort-aggregate broadcast back
    * (swap in approx_percentile at 100 TB — boundaries move, the
    * schedule survives); the within-bucket rank window parallelizes
    * only B ways — run the Packing-style two-phase prefix rank when
    * B ≪ cores at target scale. Composite packing assumes
    * key < 10^7; widen the factor for larger id spaces. */
  def curriculumOrder(df: DataFrame, score: Column, keyCol: String,
      buckets: Int = 4): DataFrame = {
    require(buckets >= 2, "curriculum needs >= 2 buckets")
    val s = df.withColumn("_cu", score * lit(10000000L) + col(keyCol))
    val thr = s.agg(array((1 until buckets).map { k =>
      expr(s"percentile_disc(${k.toDouble / buckets}) WITHIN GROUP (ORDER BY _cu)")
    }: _*).as("_thr"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("_cu"))
    s.crossJoin(broadcast(thr))
      .withColumn("bucket", size(filter(col("_thr"), t => t < col("_cu"))))
      .withColumn("pos", row_number().over(w))
      .drop("_thr", "_cu")
  }
}
