package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-category operator suites; each entry
  * has a matching DuckDB oracle in `oracleSql` unless the operation is
  * not SQL-expressible (minhash-LSH, ANN, ...), in which case the
  * driver records a rows-only check and correctness is asserted by the
  * ScalaTest specs instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, Q.QFn], Map[String, String])] = Seq(
    (CoreQueries.queries, CoreQueries.oracle),
    (WindowQueries.queries, WindowQueries.oracle),
    (Dbt3Queries.queries, Dbt3Queries.oracle),
    (FunctionQueries.queries, FunctionQueries.oracle),
    (JsonQueries.queries, JsonQueries.oracle),
    (AggExtraQueries.queries, AggExtraQueries.oracle),
    (LlmQueries.queries, LlmQueries.oracle),
    (IngestQueries.queries, IngestQueries.oracle),
    (MiscQueries.queries, MiscQueries.oracle),
    (MiscQueries2.queries, MiscQueries2.oracle),
    (AsOfQueries.queries, AsOfQueries.oracle),
    (RangeQueries.queries, RangeQueries.oracle),
    (SketchQueries.queries, SketchQueries.oracle),
    (PipelineQueries.queries, PipelineQueries.oracle),
    (HygieneQueries.queries, HygieneQueries.oracle),
    (RetrievalQueries.queries, RetrievalQueries.oracle),
    (ClusterQueries.queries, ClusterQueries.oracle),
    (EventQueries.queries, EventQueries.oracle),
    (RecursiveQueries.queries, RecursiveQueries.oracle),
    (RelExtraQueries.queries, RelExtraQueries.oracle),
    (ResampleQueries.queries, ResampleQueries.oracle)
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
