package graft

import org.apache.spark.sql.functions._

/** Guards the ScaleUp corpus generator — the harness behind every
  * committed scale artifact (BENCH_sf1/sf3, BENCH_twinmass{,30},
  * CORRECTNESS_sf{1,3}). A silently wrong corpus shape would make
  * those artifacts measure the wrong thing, so the generator itself
  * is spec-pinned: replica key offsetting, referential consistency,
  * the variants-vs-clones document text contract, and the fail-fast
  * argument guards. */
class ScaleUpSpec extends SparkSpec {

  private def gen(factor: Int, clones: Boolean, tables: Set[String],
      tag: String): String = {
    val dst = s"/tmp/graft_scaleup_spec_$tag"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dst))
    ScaleUp.scale(spark, sfDir, dst, factor, clones, tables)
    dst
  }

  test("clones mode: replica text byte-identical, ids offset, counts scale") {
    val dst = gen(3, clones = true, Set("documents"), "clones")
    val base = Tables.t(spark, sfDir, "documents")
    val scaled = Tables.t(spark, dst, "documents")
    assert(scaled.count() == 3 * base.count())
    // every content appears exactly `factor` times with distinct ids
    val classes = scaled.groupBy(md5(col("text")))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("ids"))
    assert(classes.filter(col("n") =!= 3 || col("ids") =!= 3).isEmpty,
      "a clone class deviated from exactly factor byte-identical members")
    // and the replica id sets are disjoint (stride respected)
    assert(scaled.select(col("doc_id")).distinct().count() == scaled.count())
  }

  test("variants mode: replica text differs per replica, base text kept") {
    val dst = gen(3, clones = false, Set("documents"), "variants")
    val scaled = Tables.t(spark, dst, "documents")
    // distinct texts ≈ 3× base distinct texts: the per-replica suffix
    // separates every replica's content class from the others'
    val base = Tables.t(spark, sfDir, "documents")
    val bd = base.select(col("text")).distinct().count()
    assert(scaled.select(col("text")).distinct().count() == 3 * bd,
      "variant suffix failed to separate replica content classes")
    // n_chars tracks the suffixed text: replicas r=1,2 add a 3-char
    // " v1"/" v2" suffix, so the corpus max grows by exactly 3 while
    // the base replica keeps the original min
    val Seq(bMin, bMax) = base.agg(min(col("n_chars")), max(col("n_chars")))
      .head.toSeq.map(_.asInstanceOf[Number].longValue)
    val Seq(sMin, sMax) = scaled.agg(min(col("n_chars")), max(col("n_chars")))
      .head.toSeq.map(_.asInstanceOf[Number].longValue)
    assert(sMin == bMin && sMax == bMax + 3,
      s"n_chars drifted: base [$bMin,$bMax] scaled [$sMin,$sMax]")
  }

  test("referential consistency survives replication (orders ⋈ customer)") {
    val dst = gen(2, clones = false, Set("orders", "customer"), "refs")
    val o = Tables.t(spark, dst, "orders")
    val c = Tables.t(spark, dst, "customer")
    val dangling = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
    assert(dangling.isEmpty,
      "replica offsetting broke the o_custkey -> c_custkey reference")
  }

  test("argument parsing fails fast on a misspelled mode or unknown table") {
    // parseArgs is the validation seam (ADVICE r12): testing it directly
    // means no code path here can ever reach GraftSession.get() and stop
    // the shared test session from main's finally
    intercept[IllegalArgumentException] {
      ScaleUp.parseArgs(Array(sfDir, "/tmp/graft_scaleup_spec_bad", "2", "clone"))
    }
    intercept[IllegalArgumentException] {
      ScaleUp.parseArgs(Array(sfDir, "/tmp/graft_scaleup_spec_bad", "2",
        "clones", "document"))
    }
    val ok = ScaleUp.parseArgs(Array(sfDir, "/x", "3", "clones", "orders,part"))
    assert(ok == ScaleUp.Args(sfDir, "/x", 3, exactClones = true,
      Set("orders", "part")))
  }

  test("manifest refuses a mixed-factor/mode corpus, merges same-stamp tables") {
    val dst = "/tmp/graft_scaleup_spec_manifest"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dst))
    // validate returns the merged set; write only lands after a
    // (simulated) successful run — a failed run leaves no stamp
    // (ADVICE r13: stamp-before-write over-claimed interrupted runs)
    val m1 = ScaleUp.validateManifest(dst, 10, exactClones = false, Seq("orders"))
    assert(m1 == Set("orders"))
    ScaleUp.writeManifest(dst, 10, exactClones = false, m1)
    // same stamp, more tables: allowed, table list merges
    val m2 = ScaleUp.validateManifest(dst, 10, exactClones = false, Seq("customer"))
    assert(m2 == Set("orders", "customer"))
    ScaleUp.writeManifest(dst, 10, exactClones = false, m2)
    val m = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dst, "_scaleup_manifest.json"))
    assert(m.contains("\"factor\":10") && m.contains("\"variants\""))
    assert(m.contains("\"customer\"") && m.contains("\"orders\""))
    // different factor or mode into the same dst: refused before writing
    intercept[IllegalArgumentException] {
      ScaleUp.validateManifest(dst, 30, exactClones = false, Seq("part"))
    }
    intercept[IllegalArgumentException] {
      ScaleUp.validateManifest(dst, 10, exactClones = true, Seq("part"))
    }
    // a validated-but-never-written run leaves the stamp untouched
    ScaleUp.validateManifest(dst, 10, exactClones = false, Seq("lineitem"))
    val after = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dst, "_scaleup_manifest.json"))
    assert(!after.contains("lineitem"))
  }
}
