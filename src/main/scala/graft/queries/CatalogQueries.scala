package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.InfoSchema

/** INFORMATION_SCHEMA analog queries — the reference's
  * `columnstore_extents` / `columnstore_files` / `columnstore_tables` /
  * `columnstore_columns` plugin tables (`dbcon/mysql/is_columnstore_*.cpp`)
  * re-expressed over parquet footers. DuckDB's independent footer
  * readers (`parquet_metadata` / `parquet_file_metadata` /
  * `parquet_schema`) make every view hash-checkable: two engines decode
  * the SAME footer bytes through disjoint implementations.
  */
object CatalogQueries {

  private def oracleSfDir: String =
    sys.props.getOrElse("graft.oracle.sfDir", "/root/testdata/sf0.01")

  val queries: Map[String, Q.QFn] = Map(
    // Extent analog: per row-group column-chunk stats of `orders`.
    // Restricted to plain INT64/BYTE_ARRAY chunks in the ORACLE-facing
    // projection: logical-typed columns (timestamps, decimals) render
    // min/max through engine-specific logical decoding, which would
    // test the formatter, not the footer.
    // Only UNANNOTATED INT64 and UTF8 BYTE_ARRAY chunks face the
    // oracle: logical-typed stats (timestamps, decimals) render
    // through engine-specific formatters, which would test the
    // formatter, not the footer decode.
    "q_catalog_extents" -> ((s, dir) =>
      InfoSchema.extents(s, dir, Seq("orders"))
        .where(col("physical_type").isin("INT64", "BYTE_ARRAY") &&
          (col("converted_type").isNull || col("converted_type") === "UTF8"))
        .select(
          col("table_name"), col("file_name"),
          col("row_group").cast("long").as("row_group"),
          col("column_name"), col("physical_type"),
          col("num_values"), col("null_count"),
          col("min_value"), col("max_value"),
          col("compressed_bytes"), col("uncompressed_bytes"))
        .orderBy(col("file_name"), col("row_group"), col("column_name"))),

    // Tables rollup: file/row-group/row counts across the whole dir.
    "q_catalog_tables" -> ((s, dir) =>
      InfoSchema.tables(s, dir, graft.Tables.all)
        .select(col("table_name"), col("file_count").cast("long").as("file_count"),
          col("rows").as("n_rows"), col("row_groups").cast("long").as("row_groups"))
        .orderBy(col("table_name"))),

    // Column catalog: footer schema (physical + converted type).
    "q_catalog_columns" -> ((s, dir) =>
      InfoSchema.columns(s, dir, Seq("orders", "events", "documents"))
        .select(col("table_name"), col("column_name"),
          col("physical_type"),
          coalesce(col("converted_type"), lit("NONE")).as("converted_type"),
          col("repetition"))
        .orderBy(col("table_name"), col("column_name"))),

    // File inventory: footer-derived per-file shape (row count from
    // summed block row counts — the reference's SEGMENT file listing).
    "q_catalog_files" -> ((s, dir) =>
      InfoSchema.files(s, dir, Seq("lineitem", "orders", "events"))
        .select(col("table_name"), col("file_name"),
          col("row_groups").cast("long").as("row_groups"), col("rows").as("n_rows"))
        .orderBy(col("table_name"), col("file_name"))))

  def oracle: Map[String, String] = Map(
    "q_catalog_extents" ->
      s"""SELECT 'orders' AS table_name,
         |  regexp_extract(file_name, '[^/]+$$') AS file_name,
         |  CAST(row_group_id AS BIGINT) AS row_group,
         |  path_in_schema AS column_name,
         |  CAST(type AS VARCHAR) AS physical_type,
         |  num_values,
         |  stats_null_count AS null_count,
         |  stats_min_value AS min_value,
         |  stats_max_value AS max_value,
         |  total_compressed_size AS compressed_bytes,
         |  total_uncompressed_size AS uncompressed_bytes
         |FROM parquet_metadata('$oracleSfDir/orders.parquet')
         |WHERE CAST(type AS VARCHAR) IN ('INT64','BYTE_ARRAY')
         |  AND path_in_schema IN (
         |    SELECT name FROM parquet_schema('$oracleSfDir/orders.parquet')
         |    WHERE num_children IS NULL
         |      AND (converted_type IS NULL
         |           OR CAST(converted_type AS VARCHAR) = 'UTF8'))
         |ORDER BY file_name, row_group, column_name""".stripMargin,

    "q_catalog_tables" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  COUNT(*) AS file_count,
         |  CAST(SUM(num_rows) AS BIGINT) AS n_rows,
         |  CAST(SUM(num_row_groups) AS BIGINT) AS row_groups
         |FROM parquet_file_metadata('$oracleSfDir/*.parquet')
         |GROUP BY 1 ORDER BY table_name""".stripMargin,

    "q_catalog_columns" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  name AS column_name,
         |  CAST(type AS VARCHAR) AS physical_type,
         |  COALESCE(CAST(converted_type AS VARCHAR), 'NONE') AS converted_type,
         |  CAST(repetition_type AS VARCHAR) AS repetition
         |FROM parquet_schema('$oracleSfDir/*.parquet')
         |WHERE regexp_extract(file_name, '([^/]+)[.]parquet$$', 1)
         |        IN ('orders','events','documents')
         |  AND num_children IS NULL
         |ORDER BY table_name, column_name""".stripMargin,

    "q_catalog_files" ->
      s"""SELECT regexp_extract(file_name, '([^/]+)[.]parquet$$', 1) AS table_name,
         |  regexp_extract(file_name, '[^/]+$$') AS file_name,
         |  CAST(num_row_groups AS BIGINT) AS row_groups,
         |  num_rows AS n_rows
         |FROM parquet_file_metadata('$oracleSfDir/*.parquet')
         |WHERE regexp_extract(file_name, '([^/]+)[.]parquet$$', 1)
         |        IN ('lineitem','orders','events')
         |ORDER BY table_name, file_name""".stripMargin)
}
