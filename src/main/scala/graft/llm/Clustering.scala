package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Embedding-space clustering operators for corpus curation: cluster
  * assignment against a (small, broadcast) centroid set, per-cluster
  * diversity profiles, cluster-balanced sampling, and SemDeDup-style
  * within-cluster semantic dedup (Abbas et al. 2023 — clusters bound
  * the quadratic term that makes corpus-wide all-pairs impossible).
  *
  * Centroids come from `AnnSearch.trainIvfCentroids` (the distributed
  * Lloyd trainer) or `AnnSearch.seededCentroids`; either way they are
  * nlist×dim driver literals — the broadcast-dimension-table analog,
  * never a shuffled side.
  *
  * Scale contract: assignment is the explode+max_by codegen pipeline
  * (one corpus scan, no shuffle); profiles/sampling add one groupBy /
  * bounded per-cluster window keyed by cluster; semantic dedup joins
  * same-cluster pairs only — O(Σ|cluster|²) by design, bounded by
  * nlist sizing (nlist ∝ √N keeps expected cluster size √N).
  * Assignment argmax uses RAW inner products with ties toward the
  * lower cluster id — deterministic for a given corpus regardless of
  * partitioning, and the FP sequence DuckDB's list_inner_product
  * replays exactly (the q_ann_ivf_seeded parity).
  */
object Clustering {

  private def asDouble(vec: String) = col(vec).cast(ArrayType(DoubleType))

  /** (id, cluster, cos) per corpus vector: cluster by raw-dot argmax
    * over `centroids` (ties → lower cluster id), cos = cosine to the
    * assigned centroid in the bit-matched evaluation order. */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cenArr = array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("i"), lit(cv).as("c"))
    }.toIndexedSeq: _*)
    corpus.select(col(id).as("_id"), asDouble(vec).as("_v"),
        explode(cenArr).as("_ce"))
      .select(col("_id"), col("_v"), col("_ce.i").as("_ci"),
        AnnSearch.dot(col("_v"), col("_ce.c")).as("_d"),
        AnnSearch.cosine(col("_v"), col("_ce.c")).as("_cos"))
      .groupBy(col("_id"))
      .agg(max_by(col("_ci"), struct(col("_d"), -col("_ci"))).as("cluster"),
        max_by(col("_cos"), struct(col("_d"), -col("_ci"))).as("cos"))
      .select(col("_id").as(id), col("cluster"), col("cos"))
  }

  /** Per-cluster diversity profile: population, min/max cosine to the
    * centroid (cohesion spread), and the min member id (a stable
    * representative). Only order-independent aggregates — a float SUM
    * over members would be partitioning-dependent. `cosGrid` snaps
    * cosines to the round-6 grid BEFORE aggregating (cross-engine
    * vec×centroid cosines differ in the last ulp). */
  def profiles(corpus: DataFrame, centroids: Array[Array[Double]],
      cosGrid: Boolean = false,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val cosc = if (cosGrid) round(col("cos"), 6) else col("cos")
    assign(corpus, centroids, id, vec)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), min(cosc).as("min_cos"),
        max(cosc).as("max_cos"), min(col(id)).as("rep_id"))
  }

  /** Cluster-balanced sample: the first `perCluster` members of each
    * cluster in md5(id) order — the diversity-preserving counterpart
    * of uniform sampling (a dominant mode can't crowd out the tail).
    * Same md5-order determinism contract as `Sampling`; the window is
    * bounded per cluster. */
  def balancedSample(corpus: DataFrame, centroids: Array[Array[Double]],
      perCluster: Int, id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(md5(col(id).cast("string")), col(id))
    assign(corpus, centroids, id, vec)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perCluster)
      .select(col("cluster"), col(id))
  }

  /** SemDeDup: drop every vector that has a SAME-CLUSTER neighbor
    * with cosine ≥ `threshold` and a lower id (the deterministic
    * keep-min-id rule; transitive-blind by design — chains resolve
    * via `Dedup.dupClusters` when full components matter). Returns
    * the surviving rows of `corpus`.
    *
    * The pair join is the SemDeDup trick: only same-cluster pairs are
    * compared, so the quadratic term is Σ|cluster|² not N², and each
    * pair costs one codegen'd vec_dot with per-vector norms computed
    * in the assignment scan. */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val a = assign(corpus, centroids, id, vec)
      .join(corpus.select(col(id), asDouble(vec).as("_v")), id)
    val l = a.select(col("cluster"), col(id).as("_ida"), col("_v").as("_va"))
    val r = a.select(col("cluster"), col(id).as("_idb"), col("_v").as("_vb"))
    val doomed = l.join(r, Seq("cluster"))
      .filter(col("_ida") < col("_idb"))
      .filter(AnnSearch.cosine(col("_va"), col("_vb")) >= threshold)
      .select(col("_idb").as(id)).distinct()
    corpus.join(doomed, Seq(id), "left_anti")
  }
}
