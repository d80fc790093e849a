package graft

import org.apache.spark.sql.functions._
import graft.llm.{Decontamination, Redaction, Sampling}

/** Corpus-hygiene operator proofs: decontamination overlap counting
  * (vs a direct shingle-array intersection model), redaction golden
  * values and idempotence, and mixture-sampling rate/nesting
  * properties. */
class HygieneSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox jumps over the sleeping cat"), // shares 4-gram prefix with 1
    (4L, "completely unrelated filler words here now")
  ).toDF("doc_id", "text")

  test("contaminationScores counts distinct shared shingles exactly") {
    val corpus = docsDf.filter(col("doc_id") =!= 1L)
    val bench = docsDf.filter(col("doc_id") === 1L)
    val got = Decontamination.contaminationScores(corpus, bench)
      .as[(Long, Long)].collect().toMap
    // model: |shingle_set(doc) ∩ shingle_set(bench)| computed directly
    val setOf = docsDf
      .select(col("doc_id"), call_function("shingle_set", col("text"), lit(3)).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val benchSet = setOf(1L).toSet
    val want = setOf.view.filterKeys(_ != 1L)
      .mapValues(s => s.toSet.intersect(benchSet).size.toLong)
      .filter(_._2 > 0).toMap
    assert(got == want)
    assert(got.contains(3L) && !got.contains(2L) && !got.contains(4L))
  }

  test("decontaminate removes overlapping docs and keeps the rest") {
    val corpus = docsDf.filter(col("doc_id") =!= 1L)
    val bench = docsDf.filter(col("doc_id") === 1L)
    val kept = Decontamination.decontaminate(corpus, bench, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L)) // 3 contaminated; 2 and 4 clean
    // a permissive threshold keeps everything
    val keptAll = Decontamination.decontaminate(corpus, bench, minHits = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAll == Set(2L, 3L, 4L))
  }

  test("redactText replaces typed spans and is idempotent") {
    val rows = Seq(
      "write to bob.smith+news@mail.example.co.uk today",
      "server at 192.168.0.17 responded",
      "call +4915123456789 now",
      "all three: a@b.io 10.0.0.1 +1234567 done",
      "nothing to redact here"
    ).toDF("t")
    val red = rows.select(Redaction.redactText(col("t")).as("r")).as[String].collect()
    assert(red(0) == "write to <EMAIL> today")
    assert(red(1) == "server at <IP> responded")
    assert(red(2) == "call <PHONE> now")
    assert(red(3) == "all three: <EMAIL> <IP> <PHONE> done")
    assert(red(4) == "nothing to redact here")
    // idempotent: placeholders contain no redactable spans
    val twice = rows.select(Redaction.redactText(Redaction.redactText(col("t"))).as("r"))
      .as[String].collect()
    assert(twice.sameElements(red))
  }

  test("redaction counts match what replacement rewrites") {
    val rows = Seq("a@b.io and c@d.org at 1.2.3.4", "+1234567 +7654321").toDF("t")
    val got = rows.select(
        Redaction.emailCount(col("t")).as("e"),
        Redaction.ipv4Count(col("t")).as("i"),
        Redaction.phoneCount(col("t")).as("p"))
      .as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((2, 1, 0), (0, 0, 2)))
  }

  test("chunk covers every token exactly once per stride window") {
    import graft.llm.Chunking
    val docs = Seq(
      (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 150 toks → 3 chunks at 64/16
      (2L, "short doc"),                               // 2 toks → 1 chunk
      (3L, "")                                         // 0 toks → no chunks
    ).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 64L), (1L, 1L, 48L, 64L), (1L, 2L, 96L, 54L),
      (2L, 0L, 0L, 2L)))
    // chunk text is the token slice re-joined
    val t0 = Chunking.chunk(docs, 64, 16).filter(col("doc_id") === 1 && col("chunk_idx") === 2)
      .select("chunk_text").as[String].head()
    assert(t0 == (97 to 150).map(i => s"w$i").mkString(" "))
    // no overlap: chunks partition the tokens
    val dense = Chunking.chunk(docs, chunkTokens = 64)
      .groupBy("doc_id").agg(sum("n_tok").as("s"))
    val want = docs.select(col("doc_id"),
      size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
    assert(dense.join(want, "doc_id").filter(col("s") =!= col("n")).isEmpty)
  }

  test("repetitionProfile counts duplicate lines and 2-grams") {
    val docs = Seq(
      (1L, "a b a b a"),           // 2-grams: ab ba ab ba → 4 total, 2 distinct, top 2
      (2L, "x\ny\nx\n"),           // lines x y x → 3 lines, 2 distinct
      (3L, "solo"),                // 1 token → no 2-grams
      (4L, "")
    ).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.repetitionProfile(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 4L, 2L, 2L),
      (2L, 3L, 2L, 2L, 2L, 1L),
      (3L, 1L, 1L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("mixtureSample applies per-stratum rates, deterministically nested") {
    val docs = Tables.t(spark, sfDir, "documents")
    val w1 = Map("src0" -> 0.8, "src1" -> 0.2)
    val s1 = Sampling.mixtureSample(docs, "source", "doc_id", w1, defaultFraction = 0.0)
    // strata outside the weight map fall to defaultFraction = 0
    assert(s1.filter(!col("source").isin("src0", "src1")).isEmpty)
    // rerun ⇒ identical subset
    val ids = s1.select("doc_id").as[Long].collect().toSet
    assert(Sampling.mixtureSample(docs, "source", "doc_id", w1, 0.0)
      .select("doc_id").as[Long].collect().toSet == ids)
    // lowering one stratum's weight nests inside the higher sample,
    // and leaves the other stratum's rows untouched
    val s2 = Sampling.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 0.3, "src1" -> 0.2), 0.0)
    val ids2 = s2.select("doc_id").as[Long].collect().toSet
    assert(ids2.subsetOf(ids))
    assert(s2.filter(col("source") === "src1").select("doc_id").as[Long].collect().toSet ==
      s1.filter(col("source") === "src1").select("doc_id").as[Long].collect().toSet)
  }
}
