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

  /** Write a DataFrame as a bucketed, bucket-sorted catalog table.
    * Overwrite-only by design: the table and any orphaned location
    * are dropped first (r10 ADVICE removed the `mode` parameter — an
    * append mode after the unconditional drop would silently lose the
    * existing data, and no caller ever appended). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    Warehouse.dropWithLocation(df.sparkSession, table)
    df.write.mode("overwrite")
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
