package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded random-projection dimensionality reduction for embedding
  * columns — the Johnson-Lindenstrauss workhorse of large-scale
  * vector pipelines: project d-dim embeddings to a k-dim sketch that
  * preserves pairwise Euclidean distance within (1±ε), shrinking the
  * bytes every downstream ANN/dedup shuffle moves by d/k.
  *
  * The projection matrix is the Achlioptas ±1 SIGN matrix (Achlioptas
  * 2003: database-friendly random projections) — entries R(j,i) ∈
  * {+1,−1} derived from a splitmix64 avalanche of (seed, j, i), so
  * the matrix is a pure deterministic function of the seed: never
  * materialized cluster-wide, replayable verbatim by the DuckDB
  * oracle as VALUES literals (the same trained-vs-seeded replay
  * contract as AnnSearch.seededCentroids), and identical on every
  * executor without a broadcast.
  *
  * Scale shape: one scan, k native vec_dot kernels per row (each a
  * codegen'd static call — see VectorFunctions scaladoc for why HOFs
  * are banned on this path), zero shuffles, zero driver state. At
  * 100 TB this is the cheapest operator in the embedding family.
  *
  * Reference surface analog: the funcexp scalar-function family
  * (`utils/funcexp/`) — a per-row computed projection, not a plan
  * operator. */
object Projection {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic ±1 sign matrix: `dOut` rows × `dIn` cols. */
  def seededSignMatrix(dOut: Int, dIn: Int, seed: Long = 11L): Array[Array[Double]] =
    Array.tabulate(dOut, dIn) { (j, i) =>
      if ((mix64(seed * 0x100000001b3L + j.toLong * 1000003L + i) & 1L) == 0L) 1.0
      else -1.0
    }

  /** Column of the k-dim projection of `v` (array<double>):
    * proj_j = vec_dot(v, R_j) / sqrt(dOut), j in row order. */
  def jlColumn(v: Column, m: Array[Array[Double]]): Column = {
    val scale = math.sqrt(m.length)
    array(m.map(row => AnnSearch.dot(v, lit(row)) / scale): _*)
  }

  /** Project `vec` (array<float|double>, all rows length `dIn`) down
    * to `dOut` dims; appends column `proj` (array<double>). */
  def jlProject(embs: DataFrame, dIn: Int, dOut: Int, seed: Long = 11L,
      vec: String = "embedding", out: String = "proj"): DataFrame = {
    val m = seededSignMatrix(dOut, dIn, seed)
    embs.withColumn(out, jlColumn(col(vec).cast("array<double>"), m))
  }
}
