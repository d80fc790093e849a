package graft

import org.apache.spark.sql.functions._
import graft.llm.{AnnSearch, Quantize}

/** Embedding-quantization contracts: element-wise reconstruction
  * error bounded by scale/2, codes inside int8 range, and top-k
  * recall of the dequantized corpus vs exact float search. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.t(spark, sfDir, "embeddings")

  test("int8 round-trip: codes in range, |x - q·scale| <= scale/2") {
    val q = Quantize.quantized(emb)
    val joined = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .join(q, "vec_id")
      .select(col("vec_id"), col("scale"),
        posexplode(arrays_zip(col("v"), col("q"))).as(Seq("_p", "_z")))
      .select(col("vec_id"), col("scale"),
        col("_z.v").as("x"), col("_z.q").as("c"))
    assert(joined.filter(col("c") < -127 || col("c") > 127).isEmpty)
    // half-step bound, with an ulp of slack for the biased ⌊x+½⌋ tie
    val bad = joined.filter(
      abs(col("x") - col("c").cast("double") * col("scale")) >
        col("scale") * 0.5 + lit(1e-12))
    assert(bad.isEmpty)
    // the max-magnitude element quantizes to exactly ±127 (no clamp slack)
    val extremes = joined.groupBy(col("vec_id"))
      .agg(max(abs(col("c"))).as("maxc"), max(col("scale")).as("s"))
      .filter(col("s") > 0)
    assert(extremes.filter(col("maxc") =!= 127).isEmpty)
  }

  test("dequantized top-k keeps high recall vs exact float search") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = AnnSearch.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Quantize.quantizedTopK(Quantize.quantized(emb), queries, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("random projection bounds cosine distortion, improves with outDim") {
    // the JL contract is DISTANCE distortion (≈ 1/√outDim per pair),
    // not top-k recall on near-random vectors whose cosine gaps are
    // below the distortion floor
    def meanErr(outDim: Int): Double = {
      val p = Quantize.randomProject(emb, outDim)
      def cosPairs(df: org.apache.spark.sql.DataFrame, out: String) =
        df.select(col("vec_id"), col("embedding").cast("array<double>").as("_v"))
          .as("a").join(df.select(col("vec_id"), col("embedding").cast("array<double>").as("_v")).as("b"),
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
            AnnSearch.cosine(col("a._v"), col("b._v")).as(out))
      cosPairs(emb, "c0").join(cosPairs(p, "c1"), Seq("ia", "ib"))
        .agg(avg(abs(col("c0") - col("c1")))).head().getDouble(0)
    }
    val e32 = meanErr(32)
    val e8 = meanErr(8)
    assert(e32 <= 0.25, s"mean cosine distortion at 32 dims: $e32")
    assert(e8 > e32, s"distortion should shrink with outDim: e8=$e8 e32=$e32")
    // determinism: same seed ⇒ identical projection
    val a = Quantize.randomProject(emb, outDim = 32).orderBy("vec_id").collect().toSeq
    val b = Quantize.randomProject(emb, outDim = 32).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("pq: codes well-formed, encoding deterministic") {
    val cb = Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8)
    val enc = Quantize.pqEncode(emb, cb)
    assert(enc.count() == emb.count())
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.isEmpty)
    val a = enc.orderBy("vec_id").collect().toSeq
    val b = Quantize.pqEncode(emb, cb).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("pq training lifts ADC shortlist containment of the true top-10") {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = AnnSearch.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def containment(cb: Array[Array[Array[Double]]]): Double = {
      val short = Quantize.pqAdcTopK(Quantize.pqEncode(emb, cb), cb, queries, k = 50)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      exact.count(short.contains).toDouble / exact.size
    }
    val seeded = containment(Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8))
    val trained = containment(Quantize.pqTrain(emb, m = 8, ksub = 16, iters = 5))
    // measured on this corpus: seeded ≈ 0.58-0.66, trained ≈ 0.66+;
    // floors leave slack for the sf0.001 CI corpus
    assert(seeded >= 0.3, s"seeded containment $seeded")
    assert(trained >= 0.5, s"trained containment $trained")
  }

  test("ivf-pq: reasonable recall with cell pruning, exact rerank cosines") {
    val cb = Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8)
    val cen = AnnSearch.seededCentroids(nlist = 8, dim = 64)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = AnnSearch.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val got = Quantize.ivfPqTopK(emb, queries, k = 10, cen, cb,
      nprobe = 6, shortlist = 50)
    val ids = got.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ids).size.toDouble / exact.size
    assert(recall >= 0.3, s"ivf-pq recall $recall") // 6/8 cells probed + PQ distortion
    // rerank cosines are exact
    val direct = AnnSearch.bruteForceTopK(emb, queries, k = emb.count().toInt)
      .select(col("qid"), col("vec_id"), col("cosine").as("want"))
    assert(got.join(direct, Seq("qid", "vec_id"))
      .filter(col("cosine") =!= col("want")).isEmpty)
  }

  test("persisted ivf-pq index: a probe's scan reads only the probed cells' files") {
    val cb = Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8)
    val cen = AnnSearch.seededCentroids(nlist = 8, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString + "/idx"
    Quantize.writeIvfPqIndex(emb, path, cen, cb)
    val full = spark.read.parquet(path)
    val allFiles = full.select(input_file_name()).distinct().count()
    val allCells = full.select("_cell").distinct().count()
    assert(allCells > 4, s"corpus should spread over cells, got $allCells")

    val probe = Quantize.readIvfPqIndex(spark, path, Seq(0, 1))
    probe.write.format("noop").mode("overwrite").save() // execute → metrics
    val scan = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the _cell predicate must be a PARTITION filter (pruned before
    // any file is opened), not a data filter
    assert(scan.partitionFilters.exists(_.toString.contains("_cell")),
      s"partition filters: ${scan.partitionFilters}")
    val filesRead = scan.metrics("numFiles").value
    // 2 probed cells of `allCells` populated ones: the scan touches
    // only their directories' files
    val expectedMax = math.ceil(allFiles.toDouble * 2 / allCells).toLong + 1
    assert(filesRead <= expectedMax,
      s"probe read $filesRead of $allFiles files (cells: $allCells)")
    // and the probe's ROWS are exactly the index rows of those cells
    assert(probe.count() ==
      full.filter(col("_cell").isin(0, 1)).count())
  }

  test("incremental index append: equivalent to a full rebuild, pruning intact") {
    val cb = Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8)
    val cen = AnnSearch.seededCentroids(nlist = 8, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_inc").toString
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    // standing index from the old corpus + one appended batch …
    Quantize.writeIvfPqIndex(old, s"$root/inc", cen, cb)
    Quantize.appendToIvfPqIndex(batch, s"$root/inc", cen, cb)
    // … must equal the index rebuilt from everything
    Quantize.writeIvfPqIndex(emb, s"$root/full", cen, cb)
    val inc = spark.read.parquet(s"$root/inc")
    val full = spark.read.parquet(s"$root/full")
    assert(inc.count() == full.count())
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "append must reproduce the rebuilt index row for row")
    // appended rows are probe-visible through partition pruning
    val newIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val someCell = inc.filter(col("vec_id").isin(newIds.take(3).toSeq.map(Long.box): _*))
      .select("_cell").head().getInt(0)
    val probed = Quantize.readIvfPqIndex(spark, s"$root/inc", Seq(someCell))
    assert(probed.filter(col("vec_id").isin(newIds.toSeq.map(Long.box): _*))
      .count() > 0, "appended vectors must be probe-visible")
  }

  test("pq rerank returns exact cosines for its shortlist, ranked") {
    val cb = Quantize.seededCodebooks(m = 8, ksub = 16, dsub = 8)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val got = Quantize.pqRerankTopK(Quantize.pqEncode(emb, cb), cb, emb, queries,
      k = 5, shortlist = 20)
    // each query yields exactly k ranked rows, rank dense from 1
    val counts = got.groupBy("qid").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(counts.filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).isEmpty)
    // cosines match a direct exact computation for those (qid, vec_id)
    val direct = AnnSearch.bruteForceTopK(emb, queries, k = emb.count().toInt)
      .select(col("qid"), col("vec_id"), col("cosine").as("want"))
    val mismatch = got.join(direct, Seq("qid", "vec_id"))
      .filter(col("cosine") =!= col("want"))
    assert(mismatch.isEmpty)
  }
}
