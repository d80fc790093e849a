package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}

/** INFORMATION_SCHEMA analog — the reference ships four plugin tables
  * (`dbcon/mysql/is_columnstore_extents.cpp`, `is_columnstore_files.cpp`,
  * `is_columnstore_tables.cpp`, `is_columnstore_columns.cpp`) that
  * surface the BRM extent map: per-extent min/max ("casual
  * partitioning"), block ranges, segment files, and the column
  * catalog. Our storage unit is the parquet row-group/column-chunk,
  * whose footer stats play exactly the extent-map role (the scan
  * prunes from them the way ColumnStore's lbidlist skips extents), so
  * the analog tables read parquet FOOTERS, not data.
  *
  * Scale shape: file LISTING is driver-side (metadata-sized — the
  * same role the reference's DBRM master plays); footer READS are
  * distributed over the executors (one task bundle per file slice),
  * so a 100 TB / 100k-file table never serializes footer IO through
  * the driver. Each row-group row carries only stats — no data pages
  * are touched (`ParquetFileReader.open(...).getFooter`).
  */
object InfoSchema {

  /** One row per (file, row group, column chunk) — the extent analog.
    * `min_value`/`max_value` are decoded per physical type and
    * rendered as strings, mirroring the reference's MIN_VALUE /
    * MAX_VALUE decimal-rendered columns. */
  case class ExtentRow(
      table_name: String,
      file_name: String,
      row_group: Int,
      column_name: String,
      physical_type: String,
      converted_type: Option[String],
      num_values: Long,
      null_count: Long,
      min_value: Option[String],
      max_value: Option[String],
      compressed_bytes: Long,
      uncompressed_bytes: Long)

  /** One row per data file — the is_columnstore_files analog. */
  case class FileRow(
      table_name: String,
      file_name: String,
      size_bytes: Long,
      row_groups: Int,
      rows: Long,
      created_by: Option[String])

  /** One row per column — the is_columnstore_columns analog, read
    * from the footer schema (physical + converted type, as the
    * reference reports syscolumn's colType). */
  case class ColumnRow(
      table_name: String,
      column_name: String,
      ordinal: Int,
      physical_type: String,
      converted_type: Option[String],
      repetition: String)

  /** parquet-format spelling of a physical type (parquet-hadoop's enum
    * says BINARY where the format spec — and DuckDB — say BYTE_ARRAY). */
  private def physName(t: PrimitiveTypeName): String = t match {
    case PrimitiveTypeName.BINARY => "BYTE_ARRAY"
    case other => other.name
  }

  private def listFiles(spark: SparkSession, dir: String, tables: Seq[String])
      : Seq[(String, String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    tables.flatMap { t =>
      val root = new HPath(s"$dir/$t.parquet")
      val fs = root.getFileSystem(conf)
      def walk(p: HPath): Seq[(String, Long)] = {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).toSeq
            .filterNot(s => s.getPath.getName.startsWith("_") ||
              s.getPath.getName.startsWith("."))
            .flatMap(s => walk(s.getPath))
        else if (st.getPath.getName.endsWith(".parquet") ||
          !st.getPath.getName.contains("."))
          Seq((st.getPath.toString, st.getLen))
        else Seq.empty
      }
      walk(root).map { case (p, len) => (t, p, len) }
    }
  }

  private def render(stats: org.apache.parquet.column.statistics.Statistics[_])
      : (Option[String], Option[String]) =
    if (stats == null || !stats.hasNonNullValue) (None, None)
    else {
      def s(v: Any): String = v match {
        case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
        case x => x.toString
      }
      (Some(s(stats.genericGetMin)), Some(s(stats.genericGetMax)))
    }

  /** Distributed footer scan → extent rows. */
  def extents(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, dir, tables).map { case (t, p, _) => (t, p) }
    spark.createDataset(files)
      .repartition(math.min(files.size, 32).max(1))
      .flatMap { case (table, path) =>
        // executor-local conf: footer paths are plain FS URIs; any
        // per-bucket credentials ride the default Configuration chain
        val in = HadoopInputFile.fromPath(new HPath(path), new Configuration())
        val reader = ParquetFileReader.open(in)
        try {
          val footer = reader.getFooter
          val base = path.substring(path.lastIndexOf('/') + 1)
          footer.getBlocks.asScala.zipWithIndex.flatMap { case (block, rg) =>
            block.getColumns.asScala.map { cc =>
              val (mn, mx) = render(cc.getStatistics)
              ExtentRow(
                table, base, rg, cc.getPath.toDotString,
                physName(cc.getPrimitiveType.getPrimitiveTypeName),
                Option(cc.getPrimitiveType.getOriginalType).map(_.name),
                cc.getValueCount,
                if (cc.getStatistics == null) -1L else cc.getStatistics.getNumNulls,
                mn, mx,
                cc.getTotalSize, cc.getTotalUncompressedSize)
            }
          }.toSeq
        } finally reader.close()
      }.toDF()
  }

  /** Distributed footer scan → file rows. */
  def files(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val fl = listFiles(spark, dir, tables)
    spark.createDataset(fl)
      .repartition(math.min(fl.size, 32).max(1))
      .map { case (table, path, size) =>
        val in = HadoopInputFile.fromPath(new HPath(path), new Configuration())
        val reader = ParquetFileReader.open(in)
        try {
          val footer = reader.getFooter
          FileRow(
            table, path.substring(path.lastIndexOf('/') + 1), size,
            footer.getBlocks.size,
            footer.getBlocks.asScala.map(_.getRowCount).sum,
            Option(footer.getFileMetaData.getCreatedBy))
        } finally reader.close()
      }.toDF()
  }

  /** Footer schema of the FIRST file per table → column rows (the
    * catalog view; generations created by ALTER are reconciled by
    * `Catalog`, this reports the physical footer truth). */
  def columns(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    val heads = listFiles(spark, dir, tables)
      .groupBy(_._1).map { case (t, fs) => (t, fs.map(_._2).min) }.toSeq
    spark.createDataset(heads)
      .repartition(math.min(heads.size, 32).max(1))
      .flatMap { case (table, path) =>
        val in = HadoopInputFile.fromPath(new HPath(path), new Configuration())
        val reader = ParquetFileReader.open(in)
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          schema.getFields.asScala.zipWithIndex.map { case (f, i) =>
            val prim = f.asPrimitiveType()
            ColumnRow(
              table, f.getName, i,
              physName(prim.getPrimitiveTypeName),
              Option(prim.getOriginalType).map(_.name),
              f.getRepetition.name)
          }.toSeq
        } finally reader.close()
      }.toDF()
  }

  /** Per-table rollup — the is_columnstore_tables analog. */
  def tables(spark: SparkSession, dir: String, tableNames: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    files(spark, dir, tableNames)
      .groupBy("table_name")
      .agg(
        count(lit(1)).as("file_count"),
        sum("rows").as("rows"),
        sum("size_bytes").as("size_bytes"),
        sum("row_groups").as("row_groups"))
  }

  private implicit class JIter[A](val l: java.util.List[A]) {
    def asScala: scala.collection.mutable.Buffer[A] =
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
  }
}
