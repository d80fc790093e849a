package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, LanguageModel, Retrieval}

/** Retrieval + corpus-LM operators: BM25, inverted index, unigram
  * cross-entropy, DSIR importance weights, line-granular dedup —
  * hand-computed values on small frames plus structural properties. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bm25: term frequency raises the score at equal length; misses absent") {
    val d = docs(
      1L -> "spark spark spark pad pad pad",
      2L -> "spark pad pad pad pad pad",
      3L -> "pad pad pad pad pad pad")
    val r = Retrieval.bm25(d, Seq("spark")).collect().map(x =>
      x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.keySet === Set(1L, 2L), "doc 3 matches no term")
    assert(r(1L) > r(2L), s"tf=3 must outscore tf=1: $r")
    assert(r.values.forall(_ > 0))
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val d = docs(
      1L -> "spark pad",
      2L -> "spark pad pad pad pad pad pad pad pad pad")
    val r = Retrieval.bm25(d, Seq("spark")).collect().map(x =>
      x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) > r(2L), s"shorter doc must win at equal tf: $r")
  }

  test("bm25TopK: ranked by (bm25 desc, id), limited") {
    val d = docs((1L to 30L).map(i =>
      i -> (Seq.fill(i.toInt % 5 + 1)("spark") ++ Seq.fill(8)("pad")).mkString(" ")): _*)
    val top = Retrieval.bm25TopK(d, Seq("spark"), k = 7).collect()
    assert(top.length === 7)
    val scores = top.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse, "descending by score")
    // within equal scores, ids ascend
    top.groupBy(_.getDouble(2)).values.foreach { g =>
      val ids = g.map(_.getLong(0)).toSeq
      assert(ids === ids.sorted)
    }
  }

  test("invertedIndex: df floor, sorted capped postings, cf >= df") {
    val d = docs(
      1L -> "a b c a",
      2L -> "a b",
      3L -> "a x")
    val r = Retrieval.invertedIndex(d, minDf = 2, maxPostings = 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getString(3)))
    val byTerm = r.map(t => t._1 -> t).toMap
    assert(byTerm.keySet === Set("a", "b"), "c and x are below the df floor")
    assert(byTerm("a") === ("a", 3L, 4L, "1,2"), "postings capped at 2, sorted")
    assert(byTerm("b") === ("b", 2L, 2L, "1,2"))
    assert(r.forall(t => t._3 >= t._2), "cf >= df")
  }

  test("crossEntropy: hand-computed on a 2-doc corpus; rare tokens score high") {
    // corpus: a a a b  — p(a)=3/4, p(b)=1/4
    val d = docs(1L -> "a a", 2L -> "a b")
    val r = LanguageModel.crossEntropy(d).collect().map(x =>
      x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    val ln = (x: Double) => math.log(x)
    val e1 = ln(4) - (ln(3) + ln(3)) / 2 // doc1 = {a,a}
    val e2 = ln(4) - (ln(3) + ln(1)) / 2 // doc2 = {a,b}
    assert(r(1L)._1 === 2L && r(2L)._1 === 2L)
    assert(math.abs(r(1L)._2 - e1) < 1e-6, s"${r(1L)._2} vs $e1")
    assert(math.abs(r(2L)._2 - e2) < 1e-6, s"${r(2L)._2} vs $e2")
    assert(r(2L)._2 > r(1L)._2, "the rare-token doc has higher cross-entropy")
  }

  test("importanceWeights: target-like docs weigh positive, off-target negative") {
    val d = Seq(
      (1L, "tgt tgt tgt tgt", "s0"), (2L, "tgt tgt tgt oth", "s0"),
      (3L, "oth oth oth oth", "s1"), (4L, "tgt oth oth oth", "s1"))
      .toDF("doc_id", "text", "source")
    val r = LanguageModel.importanceWeights(d, col("source") === "s0")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) > 0, s"pure-target doc must weigh positive: $r")
    assert(r(3L) < 0, s"pure-off-target doc must weigh negative: $r")
    assert(r(1L) > r(2L) && r(2L) > r(4L) && r(4L) > r(3L),
      s"monotone in target-token fraction: $r")
  }

  test("vocabulary + oovProfile: frequency cut with deterministic ties; OOV integer-exact") {
    val d = docs(1L -> "a a a b b c", 2L -> "a b z", 3L -> "")
    // counts: a=4 b=3 c=1 z=1; size 2 -> {a, b}; tie c/z broken by term asc
    assert(LanguageModel.vocabulary(d, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq("a" -> 4L, "b" -> 3L))
    assert(LanguageModel.vocabulary(d, 3).collect().map(_.getString(0)).toSeq
      === Seq("a", "b", "c"), "count tie breaks toward the lexicographically first term")
    val oov = LanguageModel.oovProfile(d, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(oov === Map(1L -> ((6L, 1L)), 2L -> ((3L, 1L)), 3L -> ((0L, 0L))),
      "c and z are OOV; the token-less doc reports (0,0)")
  }

  test("bigramCrossEntropy: hand-computed; repeated bigrams score lower") {
    // corpus bigrams: (a,b)x2 from docs 1,2; (a,c) from doc 3
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")
    val r = LanguageModel.bigramCrossEntropy(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    val ln = (x: Double) => math.log(x)
    // unigrams: a=3 b=2 c=1 -> V=3; c(a)=3
    val e12 = ln(3 + 3) - ln(2 + 1) // p(b|a) = (2+1)/(3+3)
    val e3 = ln(3 + 3) - ln(1 + 1)  // p(c|a) = (1+1)/(3+3)
    assert(r(1L)._1 === 1L && math.abs(r(1L)._2 - e12) < 1e-6)
    assert(math.abs(r(3L)._2 - e3) < 1e-6)
    assert(r(3L)._2 > r(1L)._2, "the rarer continuation scores higher (worse)")
  }

  test("kneserNeyCrossEntropy: hand-computed; discounted mass backs off to continuations") {
    // bigrams: (a,b)x2, (a,c)x1 -> c(a)=3, N1+(a,·)=2,
    // N1+(·,b)=N1+(·,c)=1, |distinct bigrams|=2, D=0.75
    // p(b|a) = (max(2-D,0) + D·2·(1/2)) / 3 = (1.25+0.75)/3 = 2/3
    // p(c|a) = (max(1-D,0) + D·2·(1/2)) / 3 = (0.25+0.75)/3 = 1/3
    // (they sum to 1 over the seen continuations — KN conserves mass)
    val d = docs(1L -> "a b", 2L -> "a b", 3L -> "a c")
    val r = LanguageModel.kneserNeyCrossEntropy(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L)._1 === 1L && math.abs(r(1L)._2 - -math.log(2.0 / 3)) < 1e-6)
    assert(math.abs(r(3L)._2 - -math.log(1.0 / 3)) < 1e-6)
    assert(r(3L)._2 > r(1L)._2, "the rarer continuation scores higher (worse)")
  }

  test("kneserNey demotes frequent single-context continuations (the Francisco property)") {
    // x and y both occur twice as continuations; x follows 2 DISTINCT
    // contexts, y follows 1. Under add-one-style frequency smoothing
    // they'd tie; under KN, p_cont(x) > p_cont(y), so the unseen-ish
    // (low c(p,c)) bigram ending in x scores BETTER (lower xent).
    // "d z" pads the distinct-bigram count to 4 so the two p_cont
    // values (2/4 vs 1/4) are the only difference between the docs
    val d = docs(1L -> "a x", 2L -> "b x", 3L -> "c y", 4L -> "c y", 5L -> "d z")
    val r = LanguageModel.kneserNeyCrossEntropy(d).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc1 (a,x): c=1, backoff via p_cont(x)=2/4; doc3 (c,y): c=2 but
    // p_cont(y)=1/4 — hand values:
    // p(x|a) = (0.25 + 0.75·1·(2/4)) / 1 = 0.625
    // p(y|c) = (max(2-0.75,0) + 0.75·1·(1/4)) / 2 = (1.25+0.1875)/2 = 0.71875
    assert(math.abs(r(1L) - -math.log(0.625)) < 1e-6)
    assert(math.abs(r(3L) - -math.log(0.71875)) < 1e-6)
  }

  test("sourceDivergence: zero for an identically-distributed source, positive else") {
    val d = Seq(
      (1L, "a b", "s0"), (2L, "a b", "s1"),       // s0 and s1 match the blend
      (3L, "a a a a", "s2"))                      // s2 skews toward 'a'
    .toDF("doc_id", "text", "source")
    val r = LanguageModel.sourceDivergence(d).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    // corpus: a=6, b=2 -> p(a)=.75; s0/s1 are 50/50 -> positive KL; s2 pure-a
    val ln = (x: Double) => math.log(x)
    val klHalf = 0.5 * ln(0.5 / 0.75) + 0.5 * ln(0.5 / 0.25)
    val klPure = 1.0 * ln(1.0 / 0.75)
    assert(math.abs(r("s0") - klHalf) < 1e-6 && math.abs(r("s1") - klHalf) < 1e-6)
    assert(math.abs(r("s2") - klPure) < 1e-6)
    assert(r.values.forall(_ >= 0), "KL is non-negative")
  }

  test("dedupLines: global first occurrence survives; order preserved; idempotent") {
    val d = docs(
      1L -> "keep one\nshared line\nkeep two",
      2L -> "shared line\nonly in two",
      3L -> "shared line\nshared line\nfresh")
    val r = Dedup.dedupLines(d).collect().map(x =>
      x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r(1L) === ("keep one\nshared line\nkeep two", 0L), "first occurrence intact")
    assert(r(2L) === ("only in two", 1L))
    assert(r(3L) === ("fresh", 2L), "both later copies removed, intra-doc too")
    // idempotence: a second pass removes nothing
    val again = Dedup.dedupLines(
      r.toSeq.map { case (id, (t, _)) => (id, t) }.toDF("doc_id", "text"))
      .agg(sum(col("n_removed"))).head.getLong(0)
    assert(again === 0L)
  }

  test("dedupLines: doc reduced to nothing still emits a row") {
    val d = docs(1L -> "x", 2L -> "x")
    val r = Dedup.dedupLines(d).collect().map(x =>
      x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r(1L) === ("x", 0L))
    assert(r(2L) === ("", 1L), "fully-deduped doc emits empty text, not a dropped row")
  }

  test("spanProfile: cross-doc and within-doc window repeats; short docs zero") {
    // docs 1 and 2 share the run "a b c d" (cross-doc dup, every
    // window of it duplicated); doc 3 repeats its own 4-token run
    // back-to-back; doc 4 is shorter than the window; doc 5 unique
    val d = docs(
      1L -> "a b c d p q",
      2L -> "z a b c d y",
      3L -> "m n o r m n o r",
      4L -> "too short",
      5L -> "u v w x s t")
    val r = Dedup.spanProfile(d, windowTokens = 4).collect().map(x =>
      x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // doc1: spans abcd bcdp cdpq → abcd dup (doc2 has it) → 1 of 3
    assert(r(1L) === ((3L, 1L)))
    assert(r(2L) === ((3L, 1L)), "zabc d y: only its abcd window is shared")
    // doc3: 5 spans; "m n o r" occurs at positions 1 and 5 → 2 dup
    assert(r(3L) === ((5L, 2L)))
    assert(r(4L) === ((0L, 0L)), "below-window doc profiles as zero spans")
    assert(r(5L) === ((3L, 0L)))
  }

  test("bpeMerges: the Sennrich worked example, deterministic tie-breaks") {
    // low×5, lower×2, newest×6, widest×3 — the paper's corpus. Round 1
    // pair counts peak at 9 for BOTH (e,s) and (s,t); the lex
    // tie-break picks (e,s). Round 2: (es,t)=9. Round 3: (l,o)=7 wins
    // the (l,o)/(o,w) tie.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = docs(1L -> text)
    val m = LanguageModel.bpeMerges(d, numMerges = 3).orderBy("rank")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(m.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("bpeMerges: overlapping pairs merge leftmost-first; loop stops when exhausted") {
    // "aaaa": (a,a) counts 3, greedy left-to-right yields [aa, aa];
    // round 2 merges (aa,aa); round 3 has no pairs left → table stops
    // at 2 rows even though 5 were requested
    val d = docs(1L -> "aaaa")
    val m = LanguageModel.bpeMerges(d, numMerges = 5).orderBy("rank")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeSegment replays learned merges: 'lowest' → [lo, w, est]") {
    // merges from the Sennrich corpus test above: (e,s), (es,t), (l,o)
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o")
    val d = docs(1L -> "lowest lowest low", 2L -> "low")
    val r = LanguageModel.bpeSegment(d, merges).collect()
      .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(
      (1L, "lo") -> 3L, (1L, "w") -> 3L, (1L, "est") -> 2L,
      (2L, "lo") -> 1L, (2L, "w") -> 1L))
  }

  test("bpeMerges differential test vs an independent model on random corpora") {
    // driver-side reference trainer: same spec (count weighted pairs,
    // argmax by (freq DESC, pair ASC), greedy left-to-right apply)
    // implemented independently over plain collections
    def modelBpe(freq: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
      var words = freq.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) }
      (1 to n).flatMap { rank =>
        val counts = words.flatMap { case (syms, f) =>
          syms.zip(syms.drop(1)).map(p => p -> f)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        counts.sortBy { case ((l, r), c) => (-c, l, r) }.headOption.map {
          case ((l, r), c) =>
            words = words.map { case (syms, f) =>
              val out = syms.foldLeft(List.empty[String]) { (acc, x) =>
                if (acc.headOption.contains(l) && x == r) (l + r) :: acc.tail
                else x :: acc
              }.reverse
              (out, f)
            }
            (rank, l, r, c)
        }
      }
    }
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(60)(Seq.fill(1 + rnd.nextInt(6))(
      ('a' + rnd.nextInt(3)).toChar).mkString)
    val text = words.mkString(" ")
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = LanguageModel.bpeMerges(docs(1L -> text), numMerges = 6)
      .orderBy("rank").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
    assert(got == modelBpe(freq, 6), "trainer ≡ independent model incl. tie-breaks")
    assert(got.size == 6, "3-char alphabet corpus sustains 6 merges")
  }

  test("bpeMergesSampled: fraction 1.0 ≡ full trainer; sample preserves head ranks") {
    // 40 identical copies of the Sennrich corpus spread across doc ids:
    // any nonempty uniform sample has the same word DISTRIBUTION as the
    // full corpus, so the sampled trainer must reproduce the full
    // trainer's merge sequence exactly (frequencies scale, ranking
    // doesn't) — the head-rank-preservation property the production
    // variant relies on.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val d = docs((1L to 40L).map(_ -> text): _*)
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    val full = table(LanguageModel.bpeMerges(d, numMerges = 3))
    assert(full.map { case (_, l, r) => (l, r) } ==
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
    // fraction 1.0: identical table including frequencies
    val all = LanguageModel.bpeMergesSampled(d, numMerges = 3, fraction = 1.0)
      .orderBy("rank").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
    val fullF = LanguageModel.bpeMerges(d, numMerges = 3)
      .orderBy("rank").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
    assert(all == fullF, "fraction=1.0 must be the full trainer")
    // a real sample: deterministic md5 filter keeps a strict subset of
    // docs, merge sequence (ranks + pairs) matches the full table
    val sampled = table(LanguageModel.bpeMergesSampled(d, numMerges = 3, fraction = 0.4))
    assert(sampled == full, "sampled head merges must match the full trainer")
    val kept = graft.llm.Sampling.uniformSample(d, "doc_id", 0.4, "bpe").count()
    assert(kept > 0 && kept < 40, s"sample must be a strict subset, kept=$kept")
  }

  test("bpePairStats matches a hand count and weights by word frequency") {
    val d = docs(1L -> "ab ab ba")
    val r = LanguageModel.bpePairStats(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("spanRuns: adjacent dup windows merge, distant ones split, coverage exact") {
    val d = docs(
      // 1 and 2 share the 5-token run "a b c d e" → one run of 5
      1L -> "a b c d e x y z",
      2L -> "q a b c d e r s",
      // back-to-back self-repeat: both interval halves touch → ONE
      // 8-token run covering the whole doc
      3L -> "m n o p m n o p",
      // the same 4-gram repeated 9 tokens apart → two disjoint runs
      4L -> "a b c d z1 z2 z3 z4 z5 a b c d",
      5L -> "u v w")
    val r = Dedup.spanRuns(d, windowTokens = 4).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((1L, 5L, 5L)))
    assert(r(2L) == ((1L, 5L, 5L)))
    assert(r(3L) == ((1L, 8L, 8L)), "touching intervals union into one run")
    assert(r(4L) == ((2L, 4L, 8L)), "gap > window leaves two disjoint runs")
    assert(r(5L) == ((0L, 0L, 0L)), "below-window doc still emits a zero row")
  }

  test("cutDupSpans: global first occurrence survives, later copies are cut") {
    val d = docs(
      1L -> "a b c d e x",          // owns the first "a b c d e" windows
      2L -> "p q a b c d e",        // its copy of the run is cut
      3L -> "m n o p m n o p",      // self-repeat: second half cut
      4L -> "z z")                  // below window: untouched
    val r = Dedup.cutDupSpans(d, windowTokens = 4).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r(1L) == (("a b c d e x", 0L)), "first occurrence intact")
    assert(r(2L) == (("p q", 5L)), "union of the two overlapping cut windows")
    assert(r(3L) == (("m n o p", 4L)), "within-doc later copy cut")
    assert(r(4L) == (("z z", 0L)))
  }

  test("span family consistency on the corpus: profile ⟺ runs ⟺ cut invariants") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val k = 8
    val joined = Dedup.spanProfile(docs, k)
      .join(Dedup.spanRuns(docs, k), "doc_id")
      .join(Dedup.cutDupSpans(docs, k).select(col("doc_id"), col("n_cut")), "doc_id")
      .select("doc_id", "total_spans", "dup_spans", "n_runs", "max_run_tokens",
        "dup_tokens", "n_cut")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (total, dup, runs, maxRun, dupTok, cut) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert((dup > 0) == (runs > 0), s"doc ${r.getLong(0)}: dup windows ⟺ runs")
      assert(dupTok >= runs * k, "every run covers at least one window")
      assert(maxRun <= dupTok && dupTok <= total + k - 1,
        "union coverage bounded by doc tokens")
      assert(cut <= dupTok,
        "cut positions are a subset of the duplicated-window union")
    }
    // and the corpus genuinely exercises the family
    assert(joined.count(_.getLong(2) > 0) > 0, "corpus has duplicated spans")
  }

  test("span family differential test vs a brute-force model on random corpora") {
    // seeded word-soup over an 8-token alphabet: k=3 windows collide
    // densely, exercising island merging, self-repeats and the
    // first-occurrence cut far beyond the handpicked cases
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(26))("t" + rnd.nextInt(8)).mkString(" ")
    }.toMap
    val k = 3
    val toksM = corpus.map { case (i, t) =>
      i -> t.split("\\s+").filter(_.nonEmpty).toSeq }
    val windows = for {
      (i, ts) <- toksM.toSeq; s <- 1 to ts.length - k + 1
    } yield (i, s, ts.slice(s - 1, s + k - 1).mkString(" "))
    val occ = windows.groupBy(_._3)
    val dupW = windows.filter(w => occ(w._3).size > 1)
    // model: profile
    val mProfile = toksM.map { case (i, ts) =>
      i -> (math.max(0, ts.length - k + 1).toLong, dupW.count(_._1 == i).toLong) }
    // model: runs (interval union, gap > k splits)
    val mRuns = toksM.keys.map { i =>
      val starts = dupW.filter(_._1 == i).map(_._2).sorted
      val islands = starts.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, s) => List((s, s))
        case ((lo, hi) :: rest, s) =>
          if (s - hi <= k) (lo, s) :: rest else (s, s) :: (lo, hi) :: rest
      }.map { case (lo, hi) => hi - lo + k }
      i -> (islands.size.toLong,
        islands.maxOption.getOrElse(0).toLong, islands.sum.toLong)
    }.toMap
    // model: cut (global first occurrence per window text survives)
    val firstOf = occ.view.mapValues(_.minBy(w => (w._1, w._2))).toMap
    val mCut = toksM.map { case (i, ts) =>
      val cutPos = dupW.filter(w => w._1 == i && firstOf(w._3) != w)
        .flatMap(w => w._2 until w._2 + k).toSet
      val keptTxt = ts.zipWithIndex.collect {
        case (t, p) if !cutPos.contains(p + 1) => t }.mkString(" ")
      i -> (keptTxt, cutPos.size.toLong)
    }
    import spark.implicits._
    val d = corpus.toSeq.toDF("doc_id", "text")
    val gotP = Dedup.spanProfile(d, k).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val gotR = Dedup.spanRuns(d, k).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    val gotC = Dedup.cutDupSpans(d, k).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(gotP == mProfile, "profile ≡ model")
    assert(gotR == mRuns, "runs ≡ model")
    assert(gotC == mCut, "cut ≡ model")
    assert(mProfile.values.exists(_._2 > 0), "generator produced real dups")
  }

  test("spanProfile: case is NOT folded — 'A b c d' and 'a b c d' differ") {
    val d = docs(1L -> "A b c d", 2L -> "a b c d")
    val r = Dedup.spanProfile(d, windowTokens = 4).collect().map(x =>
      x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(1L -> 0L, 2L -> 0L))
  }

  test("unigramSegment viterbi == exhaustive argmax; greedy is longest-match") {
    import graft.llm.LanguageModel
    // vocab with tie-free scores (distinct powers of 1/2)
    val vocab = Map("ab" -> math.log(0.25), "bc" -> math.log(0.125),
      "a" -> math.log(0.0625), "b" -> math.log(0.03125),
      "c" -> math.log(0.015625), "abc" -> math.log(0.5))
    def exhaustive(s: String): Double = {
      def go(pos: Int): Double =
        if (pos == s.length) 0.0
        else (1 to math.min(3, s.length - pos)).map { l =>
          val p = s.substring(pos, pos + l)
          vocab.get(p).map(_ + go(pos + l)).getOrElse(Double.NegativeInfinity)
        }.max
      go(0)
    }
    val d = docs(1L -> "abcabc", 2L -> "abcb", 3L -> "cab")
    val vit = LanguageModel.unigramSegment(d, vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, txt) <- Seq(1L -> "abcabc", 2L -> "abcb", 3L -> "cab")) {
      val score = vit(id).split('|').map(vocab).sum
      assert(math.abs(score - exhaustive(txt)) < 1e-12,
        s"doc $id: ${vit(id)} scored $score vs ${exhaustive(txt)}")
    }
    val greedy = LanguageModel.unigramSegment(d, vocab, greedy = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(greedy(2L) == "abc|b")       // longest-first even when
    assert(vit(2L) == "abc|b")          // ...viterbi agrees here
    assert(greedy(3L) == "c|ab")
  }

  test("unigramTrain: full char coverage, loss decreases, segments the corpus") {
    import graft.llm.LanguageModel
    val d = docs(
      1L -> "the merge the merge sort", 2L -> "merge sort the batch",
      3L -> "the the merge batch sort", 4L -> "sort batch merge the")
    val vocab = LanguageModel.unigramTrain(d, vocabSize = 40, emRounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // every character of the corpus is a piece (coverage by construction)
    for (ch <- "themergsortbach_".distinct.filter(_ != '_'))
      assert(vocab.contains(ch.toString), s"missing char piece '$ch'")
    // frequent whole words should survive as multi-char pieces
    assert(vocab.keys.exists(_.length >= 3), s"no multi-char piece in $vocab")
    // the trained vocab segments every doc with finite score
    val seg = LanguageModel.unigramSegment(d, vocab)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(seg.length == 4 && seg.forall(_._3 > 0))
    // segmenting with the vocab never emits an unknown multi-char piece
    for ((_, pieces, _) <- seg; p <- pieces.split('|') if p.length > 1)
      assert(vocab.contains(p), s"unknown piece $p")
  }

  test("percentile_disc follows the ceil(p*n)-rank rule DuckDB's quantile_disc uses") {
    // the ccnet/rfm threshold gates hash-compare Spark percentile_disc
    // against DuckDB quantile_disc — both must pick the ceil(p*n)-th
    // smallest (smallest value with cume_dist >= p). n=5, p=2/3 is the
    // case where the OTHER common definition (floor-index, value at
    // floor(p*(n-1))) diverges: ceil-rank says 4, floor-index says 3.
    val five = Seq(1, 2, 3, 4, 5).toDF("x")
    def disc(df: org.apache.spark.sql.DataFrame, p: String): Int =
      df.agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY x)"))
        .head.getDouble(0).toInt
    assert(disc(five, "CAST(2 AS DOUBLE)/3") == 4)
    assert(disc(five, "CAST(1 AS DOUBLE)/3") == 2)
    // boundary: n divisible by 3 — fl(1/3)*n rounds just under n/3,
    // cume k/n rounds exactly to fl(1/3); both rules land on rank n/3
    val six = Seq(1, 2, 3, 4, 5, 6).toDF("x")
    assert(disc(six, "CAST(1 AS DOUBLE)/3") == 2)
    assert(disc(six, "CAST(2 AS DOUBLE)/3") == 4)
  }

  test("perplexityBuckets: approx default and exact mode agree; no window in plan") {
    import graft.llm.LanguageModel
    val d = docs((1L to 60L).map(i =>
      i -> (s"tok$i " * (1 + (i % 7).toInt) + "common words here")): _*)
    val exact = LanguageModel.perplexityBuckets(d, exact = true)
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val approx = LanguageModel.perplexityBuckets(d)
      .select("doc_id", "bucket").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // accuracy 10000 >> 60 rows: the GK sketch is exact in this regime,
    // so the default path must agree bucket-for-bucket with exact mode
    assert(exact == approx, "approx-threshold buckets diverged from exact")
    assert(exact.values.toSet == Set("head", "middle", "tail"))
    // the scale contract itself: neither mode plans ANY window node
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (m <- Seq(true, false)) {
      val w = LanguageModel.perplexityBuckets(d, exact = m)
        .queryExecution.optimizedPlan.collect { case n: LWindow => n }
      assert(w.isEmpty, s"perplexityBuckets(exact=$m) planned a window")
    }
  }
}
