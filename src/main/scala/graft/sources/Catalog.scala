package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal persistent table catalog over a warehouse directory —
  * the role of the reference's system catalog + extent map
  * (`dbcon/execplan/calpontsystemcatalog.h`, `versioning/BRM/
  * extentmap.h`): names → (location, schema, format), durable across
  * sessions, no external metastore.
  *
  * Layout: `<warehouse>/<table>/` holds the parquet data;
  * `<warehouse>/_catalog/<table>.json` holds the schema (Spark's own
  * JSON schema serialization — lossless for all mapped types).
  * Parquet footers carry the per-file min/max stats that stand in for
  * the reference's casual-partitioning extent metadata.
  */
final class Catalog(val warehouse: String, spark: SparkSession) {

  private val metaDir: Path = Paths.get(warehouse, "_catalog")
  Files.createDirectories(metaDir)

  private def metaFile(table: String): Path = metaDir.resolve(s"$table.json")
  def tableLocation(table: String): String = s"$warehouse/$table"

  private def propsFile(table: String): Path = metaDir.resolve(s"$table.props")

  /** CREATE TABLE from a MariaDB DDL string (or bare column list).
    * `props` carries per-table storage options — the reference's
    * per-table compression selection (`utils/compress/idbcompress.h:
    * 285,318`, COMPRESSION=n DDL attribute) maps to
    * `compression -> snappy|zstd|gzip|lz4|none` applied to every
    * parquet write for the table. */
  def createTable(table: String, ddl: String,
      props: Map[String, String] = Map.empty): StructType = {
    val schema = TypeMapper.parseDdl(ddl)
    require(!Files.exists(metaFile(table)), s"table exists: $table")
    Files.writeString(metaFile(table), schema.json)
    if (props.nonEmpty)
      Files.writeString(propsFile(table),
        props.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n"))
    Files.createDirectories(Paths.get(tableLocation(table)))
    schema
  }

  def tableProps(table: String): Map[String, String] =
    if (!Files.exists(propsFile(table))) Map.empty
    else Files.readAllLines(propsFile(table)).asScala.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap

  /** The table's parquet codec (default: session/parquet default). */
  def codecOf(table: String): Option[String] = tableProps(table).get("compression")

  /** The table's storage format: `format -> parquet|orc` prop
    * (default parquet). Both are columnar with footer min/max stats
    * and pushed filters — the engine surface is format-agnostic, the
    * prop is the reference's per-table storage choice made explicit. */
  def formatOf(table: String): String = tableProps(table).getOrElse("format", "parquet")

  /** Apply the table's storage props to a writer. */
  def configureWriter[T](table: String,
      w: org.apache.spark.sql.DataFrameWriter[T]): org.apache.spark.sql.DataFrameWriter[T] = {
    val f = w.format(formatOf(table))
    codecOf(table).map(c => f.option("compression", c)).getOrElse(f)
  }

  def dropTable(table: String): Unit = {
    require(Files.exists(metaFile(table)), s"no such table: $table")
    Files.delete(metaFile(table))
    Files.deleteIfExists(propsFile(table))
    val loc = Paths.get(tableLocation(table))
    if (Files.exists(loc)) {
      Files.walk(loc).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  def listTables(): Seq[String] =
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString.stripSuffix(".json")).toSeq.sorted

  def schemaOf(table: String): StructType = {
    require(Files.exists(metaFile(table)), s"no such table: $table")
    DataType.fromJson(Files.readString(metaFile(table))).asInstanceOf[StructType]
  }

  /** Load a table as a DataFrame (empty-but-typed when no data yet). */
  def load(table: String): DataFrame = {
    val schema = schemaOf(table)
    val fmt = formatOf(table)
    val loc = Paths.get(tableLocation(table))
    val hasData = Files.exists(loc) &&
      Files.list(loc).iterator().asScala.exists(_.toString.endsWith(s".$fmt"))
    if (hasData) spark.read.schema(schema).format(fmt).load(tableLocation(table))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Register every catalog table as a temp view. */
  def registerViews(): Unit =
    listTables().foreach(t => load(t).createOrReplaceTempView(t))

  // ---- partition management (ref dbcon/mysql/ha_mcs_partition.cpp:
  // 484-575 — enable/disable/drop partition; a disabled partition's
  // data stays on disk but is excluded from scans) ----

  private def disabledMarker(table: String, part: String): Path =
    Paths.get(tableLocation(table), part, "_disabled")

  /** Write a DataFrame hive-partitioned by a column. Subsequent
    * `load` calls prune partitions via the directory layout (the
    * extent-elimination analog made explicit on disk). */
  def writePartitioned(table: String, df: DataFrame, partitionCol: String,
      mode: String = "overwrite"): Unit =
    configureWriter(table, df.write.mode(mode).partitionBy(partitionCol))
      .save(tableLocation(table)) // format set by configureWriter

  /** List partition directory names (`col=value`). */
  def partitions(table: String): Seq[String] = {
    val loc = Paths.get(tableLocation(table))
    if (!Files.exists(loc)) Seq.empty
    else Files.list(loc).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .map(_.getFileName.toString).toSeq.sorted
  }

  def disablePartition(table: String, part: String): Unit = {
    require(partitions(table).contains(part), s"no partition $part")
    Files.writeString(disabledMarker(table, part), "")
  }

  def enablePartition(table: String, part: String): Unit =
    Files.deleteIfExists(disabledMarker(table, part))

  /** Drop a partition's data permanently. */
  def dropPartition(table: String, part: String): Unit = {
    require(partitions(table).contains(part), s"no partition $part")
    val dir = Paths.get(tableLocation(table), part)
    Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Load a partitioned table, excluding disabled partitions; keeps
    * the partition column via basePath so partition pruning on it
    * still works downstream. */
  def loadPartitioned(table: String): DataFrame = {
    val enabled = partitions(table)
      .filterNot(p => Files.exists(disabledMarker(table, p)))
      .map(p => s"${tableLocation(table)}/$p")
    require(enabled.nonEmpty, s"no enabled partitions in $table")
    spark.read.option("basePath", tableLocation(table))
      .format(formatOf(table)).load(enabled: _*)
  }
}
