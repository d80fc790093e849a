package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANALYZE-statistics surface — the analog of the reference's
  * `ANALYZE TABLE` → MCV statistics distribution
  * (`utils/common/statistics.h:51-145` StatisticsManager,
  * `dbcon/execplan/mcsanalyzetableexecutionplan.h`,
  * row estimation `dbcon/joblist/rowestimator.h:39-129`).
  *
  * Two tiers, matching how Spark actually consumes statistics:
  *  - `analyze(table)`: catalog-table statistics (row count, size,
  *    per-column NDV/min/max/null counts, optional histograms =
  *    the MCV analog) that feed the CBO's join reordering and
  *    build-side selection. Requires a catalog-managed table —
  *    parquet-path DataFrames don't have a durable stats home.
  *  - AQE (enabled in GraftSession) re-plans joins from RUNTIME
  *    shuffle statistics — at 100 TB this is the load-bearing
  *    mechanism; ANALYZE-time stats complement it by fixing the
  *    initial join order before any shuffle exists.
  */
object Analyze {

  /** Register a DataFrame as a catalog-managed table and compute
    * full statistics incl. column NDV/min/max and equi-height
    * histograms (the MCV-style distribution the reference ships to
    * its ExeMgrs). Returns the analyzed table name. */
  def analyzed(spark: SparkSession, df: DataFrame, table: String,
      columns: Seq[String] = Seq.empty): String = {
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    Warehouse.dropWithLocation(spark, table) // catalog + orphaned location
    df.write.mode("overwrite").saveAsTable(table)
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
    table
  }

  /** Read back the stats the optimizer will see (DESCRIBE EXTENDED). */
  def tableStats(spark: SparkSession, table: String): Map[String, String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  def columnStats(spark: SparkSession, table: String, column: String): Map[String, String] =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table $column")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
}
