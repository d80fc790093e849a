package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins — the
  * storage-level analog of the reference distributing rows to PMs by
  * key so PM-side joins probe locally (SURVEY §0; DEC row routing).
  *
  * A fact table bucketed on its join key joins a same-bucketed
  * dimension WITHOUT any shuffle: Spark matches the output
  * partitioning of both scans to the join's required distribution.
  * At 100 TB this converts the dominant cost of every key-aligned
  * join/aggregation from a full network shuffle to local hash work —
  * bucket the big tables once at load time (`CsvImporter` →
  * `writeBucketed`), then every downstream join on that key is
  * exchange-free. Bucket count should be sized so bucket ≈ a few
  * hundred MB at the target scale (like extent sizing).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: String = "overwrite"): Unit = {
    // a managed-table LOCATION can outlive its catalog entry (the
    // in-memory catalog dies with the session, the warehouse dir does
    // not) — CREATE then refuses the orphaned path (same hazard as
    // Analyze.analyzed)
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir
  }

  /** True when the executed plan of `df` contains no shuffle
    * exchange — the property bucketing is meant to buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
