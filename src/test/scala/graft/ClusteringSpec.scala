package graft

import org.apache.spark.sql.functions._
import graft.llm.{AnnSearch, Clustering}

/** Clustering operators: assignment correctness vs brute force,
  * profile conservation, balanced-sample bounds, and the SemDeDup
  * invariant (no surviving same-cluster pair above threshold). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val cen: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.map { case (i, v) => (i, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

  test("assign: argmax of raw dot, ties to the lower cluster id") {
    val d = vecs(
      1L -> Seq(0.9, 0.1, 0.0, 0.0),  // cluster 0
      2L -> Seq(0.1, 0.9, 0.0, 0.0),  // cluster 1
      3L -> Seq(0.0, 0.5, 0.5, 0.0),  // tie between 1 and 2 -> 1
      4L -> Seq(0.0, 0.0, 0.0, 1.0))  // dot 0 everywhere -> cluster 0
    val r = Clustering.assign(d, cen).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("profiles: cluster populations conserve the corpus; spread is ordered") {
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val cen16 = AnnSearch.seededCentroids(16, 64)
    val p = Clustering.profiles(emb, cen16).collect()
    assert(p.map(_.getLong(1)).sum === emb.count())
    assert(p.forall(r => r.getDouble(2) <= r.getDouble(3)), "min_cos <= max_cos")
  }

  test("balancedSample: at most perCluster members each, deterministic") {
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val cen16 = AnnSearch.seededCentroids(16, 64)
    val s1 = Clustering.balancedSample(emb, cen16, perCluster = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val s2 = Clustering.balancedSample(emb, cen16, perCluster = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(s1 === s2, "md5-order sampling is deterministic")
    s1.groupBy(_._1).values.foreach(g => assert(g.size <= 3))
  }

  test("semanticDedup: keep-min-id on duplicate vectors; survivors have no hot pair") {
    val d = vecs(
      1L -> Seq(1.0, 0.0, 0.0, 0.0), 2L -> Seq(1.0, 0.0, 0.0, 0.0), // dups, keep 1
      3L -> Seq(0.0, 1.0, 0.0, 0.0),
      4L -> Seq(0.0, 0.99, 0.1, 0.0)) // near-dup of 3 in cluster 1, dropped
    val kept = Clustering.semanticDedup(d, cen, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
    // invariant on the real corpus: no SURVIVING same-cluster pair >= thr
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val cen16 = AnnSearch.seededCentroids(16, 64)
    val surv = Clustering.semanticDedup(emb, cen16, threshold = 0.3)
    val again = Clustering.semanticDedup(surv, cen16, threshold = 0.3)
    assert(again.count() === surv.count(), "semanticDedup is idempotent")
  }
}
