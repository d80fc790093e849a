package graft

import org.apache.spark.sql.functions._
import graft.llm.{AnnSearch, Projection}

/** Johnson-Lindenstrauss projection: determinism, shape, and the
  * distance-preservation guarantee it exists for. */
class ProjectionSpec extends SparkSpec {

  test("seeded sign matrix is deterministic, ±1-valued, and roughly balanced") {
    val m1 = Projection.seededSignMatrix(16, 64)
    val m2 = Projection.seededSignMatrix(16, 64)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(x => x == 1.0 || x == -1.0))
    val pos = m1.flatten.count(_ == 1.0).toDouble / (16 * 64)
    assert(pos > 0.4 && pos < 0.6, s"sign balance off: $pos")
    assert(Projection.seededSignMatrix(16, 64, seed = 99L).map(_.toSeq).toSeq
      !== m1.map(_.toSeq).toSeq, "seed must change the matrix")
  }

  test("pairwise squared distances survive 64→16 projection within JL bounds") {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val p = Projection.jlProject(e, dIn = 64, dOut = 16, vec = "v")
    val a = p.select(col("vec_id").as("ia"), col("v").as("va"), col("proj").as("pa"))
    val b = p.select((col("vec_id") - 1).as("ia"), col("v").as("vb"),
      col("proj").as("pb"))
    def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      AnnSearch.dot(x, x) - lit(2.0) * AnnSearch.dot(x, y) + AnnSearch.dot(y, y)
    val ratios = a.join(b, "ia")
      .select((d2(col("pa"), col("pb")) / d2(col("va"), col("vb"))).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.length >= 50)
    // k=16 gives a loose per-pair ε, so the guarantee is statistical:
    // the MEAN concentrates at 1 exactly (E[ratio] = 1 for ±1 R), at
    // least 98% of pairs land in a wide band, and even tail pairs stay
    // bounded (chi-square-like tails, ~1/500 outside [0.3, 2.6])
    val inBand = ratios.count(r => r > 0.3 && r < 2.6).toDouble / ratios.length
    assert(inBand >= 0.98, s"only ${inBand * 100}%% of ratios in band")
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"pathological ratio: ${ratios.filterNot(r => r > 0.1 && r < 4.0).mkString(",")}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean ratio $mean")
  }

  test("projection output: dOut columns per row, no shuffle in the plan") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val p = Projection.jlProject(e, dIn = 64, dOut = 16)
    assert(p.select(size(col("proj"))).distinct().collect().map(_.getInt(0)).toSeq
      === Seq(16))
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "JL projection must be shuffle-free")
  }
}
