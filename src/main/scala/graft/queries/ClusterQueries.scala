package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{AnnSearch, Clustering}

/** Embedding-clustering operators: centroid assignment, per-cluster
  * diversity profiles, cluster-balanced sampling, and SemDeDup-style
  * within-cluster semantic dedup.
  *
  * All four are fully oracle-checked on the SEEDED 16×64 centroid set
  * (the q_ann_ivf_seeded parity): raw-dot argmax with lower-id ties
  * is a pure function of the corpus that DuckDB's list_inner_product
  * replays bit-exactly, cosines use the bit-matched evaluation order,
  * and profile aggregates are order-independent (count/min/max — a
  * float SUM over members would be partitioning-dependent). */
object ClusterQueries {
  import Q._

  private val Nlist = 16
  private val Dim = 64

  private def cen = AnnSearch.seededCentroids(Nlist, Dim)

  /** The seeded centroids as DuckDB VALUES rows (Double.toString
    * round-trips; DuckDB parses the identical IEEE double). */
  private def cenRows: String =
    cen.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}]::DOUBLE[])" }
      .mkString(",\n")

  /** Shared oracle fragment: per-vector cluster assignment. */
  private def asgSql =
    s"""cen(ci, c) AS (VALUES
      |$cenRows),
      |corp AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |asg AS (
      |  SELECT vec_id, label, v, ci, list_cosine_similarity(v, c) AS cos,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY list_inner_product(v, c) DESC, ci) AS rn
      |  FROM corp CROSS JOIN cen),
      |cells AS (SELECT vec_id, label, v, ci, cos FROM asg WHERE rn = 1)""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_cluster_assign" -> ((s, dir) => {
      // cos on the round-6 grid: vec×CENTROID cosines (full-precision
      // double literals) land an ulp apart between the engines' norm
      // orders, unlike the float-sourced vec×vec cosines q_dedup_cosine
      // bit-matches. Assignment itself (raw-dot argmax) is bit-stable.
      Clustering.assign(t(s, dir, "embeddings"), cen)
        .select(col("vec_id"), col("cluster"), round(col("cos"), 6).as("cos"))
        .orderBy(col("vec_id"))
    }),
    "q_cluster_profile" -> ((s, dir) => {
      Clustering.profiles(t(s, dir, "embeddings"), cen, cosGrid = true)
        .orderBy(col("cluster"))
    }),
    "q_sample_cluster" -> ((s, dir) => {
      Clustering.balancedSample(t(s, dir, "embeddings"), cen, perCluster = 5)
        .orderBy(col("cluster"), col("vec_id"))
    }),
    "q_dedup_semantic" -> ((s, dir) => {
      // threshold in the corpus's qualifying tail (same regime as
      // q_dedup_cosine's 0.4) so the within-cluster rule has real work
      Clustering.semanticDedup(t(s, dir, "embeddings"), cen, threshold = 0.3)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_cluster_assign" ->
      s"""WITH $asgSql
        |SELECT vec_id, CAST(ci AS INT) AS cluster, round(cos, 6) AS cos
        |FROM cells ORDER BY vec_id""".stripMargin,
    "q_cluster_profile" ->
      s"""WITH $asgSql
        |SELECT CAST(ci AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n,
        |  min(round(cos, 6)) AS min_cos, max(round(cos, 6)) AS max_cos,
        |  min(vec_id) AS rep_id
        |FROM cells GROUP BY ci ORDER BY cluster""".stripMargin,
    "q_sample_cluster" ->
      s"""WITH $asgSql,
        |rk AS (
        |  SELECT ci, vec_id,
        |    row_number() OVER (PARTITION BY ci
        |      ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn
        |  FROM cells)
        |SELECT CAST(ci AS INT) AS cluster, vec_id FROM rk
        |WHERE rn <= 5 ORDER BY cluster, vec_id""".stripMargin,
    "q_dedup_semantic" ->
      s"""WITH $asgSql,
        |doomed AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM cells a JOIN cells b
        |    ON a.ci = b.ci AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.3)
        |SELECT e.vec_id, e.label FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM doomed)
        |ORDER BY e.vec_id""".stripMargin
  )
}
