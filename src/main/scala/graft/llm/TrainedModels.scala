package graft.llm

import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Per-corpus trained ANN model cache — the bridge that lets TRAINED
  * variants be driver-hash-checked the same way the seeded ones are.
  *
  * The trainers (`AnnSearch.trainIvfCentroids`, `Quantize.pqTrain`)
  * are offline jobs whose output is metadata-sized (nlist×dim doubles,
  * m×ksub×dsub doubles). Caching one result per (dir, params) in the
  * JVM means the query run and the oracle-SQL builder use the SAME
  * in-memory array: the query embeds it as Spark literals, the oracle
  * embeds it as DuckDB VALUES literals (Double.toString round-trips to
  * the identical IEEE double), so the driver's hash compare replays
  * assignment → probe → score → top-k bit-for-bit even though the
  * model was trained, not seeded. Within-process consistency is the
  * point: FP reduction order across shuffle partitions can vary
  * between JVMs, but both sides of one Verify run share this cache.
  *
  * At 100 TB the equivalent artifact is a persisted model table
  * (centroids/codebooks parquet next to the index, as
  * `Quantize.writeIvfPqIndex` lays out); this cache is the in-process
  * analog for the verification harness.
  */
object TrainedModels {
  private val ivfCache = TrieMap.empty[String, Array[Array[Double]]]
  private val pqCache = TrieMap.empty[String, Array[Array[Array[Double]]]]

  /** Lloyd-trained IVF centroids over `dir`'s embeddings table,
    * memoized per (dir, nlist, iters). */
  def ivfCentroids(spark: SparkSession, dir: String,
      nlist: Int = 16, iters: Int = 3): Array[Array[Double]] =
    ivfCache.getOrElseUpdate(s"$dir|$nlist|$iters",
      AnnSearch.trainIvfCentroids(
        graft.Tables.t(spark, dir, "embeddings"), nlist = nlist, iters = iters))

  /** k-means-trained PQ codebooks over `dir`'s embeddings table,
    * memoized per (dir, m, ksub, iters). */
  def pqCodebooks(spark: SparkSession, dir: String,
      m: Int = 8, ksub: Int = 16, iters: Int = 3): Array[Array[Array[Double]]] =
    pqCache.getOrElseUpdate(s"$dir|$m|$ksub|$iters",
      Quantize.pqTrain(
        graft.Tables.t(spark, dir, "embeddings"), m = m, ksub = ksub, iters = iters))
}
