package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bulk CSV/TSV loader — the cpimport analog
  * (`writeengine/bulk/cpimport.cpp`, `we_bulkload.cpp`; flags
  * mirrored from its CLI: -s delimiter, -E enclosure, -n null
  * marker). Parses in parallel across executors, writes
  * schema-typed parquet into the catalog table location, and reports
  * rejected rows the way cpimport writes .err/.bad files.
  *
  * Scale notes: the read is a plain distributed CSV scan (splittable
  * for uncompressed files); `targetFileMB` sizes output files via a
  * repartition on estimated input size so a 100 TB load produces
  * sensibly-sized parquet (≈extent-sized row groups) instead of one
  * file per input split; PERMISSIVE + corrupt-record capture keeps a
  * single bad row from killing an hours-long load.
  */
object CsvImporter {

  final case class ImportResult(rowsLoaded: Long, rowsRejected: Long, files: Int)

  def importCsv(
      spark: SparkSession,
      catalog: Catalog,
      table: String,
      csvPath: String,
      delimiter: String = ",",
      enclosure: String = "\"",
      nullMarker: String = "",
      header: Boolean = false,
      mode: SaveMode = SaveMode.Append,
      targetFileMB: Int = 256,
      charset: String = "UTF-8"): ImportResult = {

    val schema = catalog.schemaOf(table)
    val withCorrupt = schema.add("_corrupt_record", "string", nullable = true)

    val raw = spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("quote", enclosure)
      .option("nullValue", nullMarker)
      // source charset conversion on ingest (cpimport converts client
      // charsets while loading, writeengine/bulk/we_bulkload.cpp):
      // latin1/cp1251/... input decodes to UTF-8 table content here —
      // Spark's text line reader handles non-UTF8 single-byte charsets
      // per-split, so the load stays distributed and splittable
      .option("encoding", charset)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
      .option("enforceSchema", "true")
      .csv(csvPath)
      .cache() // one pass for good rows, one for the reject count

    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull).count()

    // size output files: estimate from input bytes (compressed parquet
    // lands well under this; the goal is avoiding 10k tiny files)
    val inputBytes = try {
      val p = new org.apache.hadoop.fs.Path(csvPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => 0L }
    val parts = math.max(1, (inputBytes / (targetFileMB.toLong << 20)).toInt)

    val sized = if (good.rdd.getNumPartitions > parts * 4) good.repartition(parts) else good
    catalog.configureWriter(table, sized.write.mode(mode))
      .save(catalog.tableLocation(table)) // format set by configureWriter

    val loaded = raw.count() - bad
    raw.unpersist()
    // Hadoop FS, not java.io: the table location may be remote storage
    val tLoc = new org.apache.hadoop.fs.Path(catalog.tableLocation(table))
    val ext = s".${catalog.formatOf(table)}"
    val files = tLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(tLoc).count(_.getPath.getName.endsWith(ext))
    ImportResult(loaded, bad, files)
  }
}
