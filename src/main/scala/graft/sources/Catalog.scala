package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

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
  *
  * All metadata IO goes through the Hadoop FileSystem API, so the
  * warehouse may live on `file:`, `hdfs:`, `s3a:`, ... — the catalog
  * never assumes the driver's local disk (the reference keeps this
  * state behind its storage manager for the same reason).
  */
final class Catalog(val warehouse: String, spark: SparkSession) {

  private val fs: FileSystem =
    new HPath(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val whRoot: HPath = fs.makeQualified(new HPath(warehouse))
  private val metaDir: HPath = new HPath(whRoot, "_catalog")
  fs.mkdirs(metaDir)

  private def metaFile(table: String): HPath = new HPath(metaDir, s"$table.json")

  /** Table data directory, spelled as given (`<warehouse>/<table>`) —
    * callers hand it to spark.read/write, which qualifies it through
    * the same Hadoop FS resolution this catalog uses internally. */
  def tableLocation(table: String): String = s"$warehouse/$table"

  private def propsFile(table: String): HPath = new HPath(metaDir, s"$table.props")

  private def readString(p: HPath): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeString(p: HPath, s: String): Unit = {
    val out = fs.create(p, /* overwrite = */ true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** CREATE TABLE from a MariaDB DDL string (or bare column list).
    * `props` carries per-table storage options — the reference's
    * per-table compression selection (`utils/compress/idbcompress.h:
    * 285,318`, COMPRESSION=n DDL attribute) maps to
    * `compression -> snappy|zstd|gzip|lz4|none` applied to every
    * parquet write for the table. */
  def createTable(table: String, ddl: String,
      props: Map[String, String] = Map.empty): StructType = {
    val schema = TypeMapper.parseDdl(ddl)
    require(!fs.exists(metaFile(table)), s"table exists: $table")
    writeString(metaFile(table), schema.json)
    if (props.nonEmpty)
      writeString(propsFile(table),
        props.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n"))
    fs.mkdirs(new HPath(whRoot, table))
    schema
  }

  def tableProps(table: String): Map[String, String] =
    if (!fs.exists(propsFile(table))) Map.empty
    else readString(propsFile(table)).split("\n").toSeq.filter(_.contains("="))
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
    require(fs.exists(metaFile(table)), s"no such table: $table")
    fs.delete(metaFile(table), false)
    fs.delete(propsFile(table), false)
    fs.delete(new HPath(whRoot, table), /* recursive = */ true)
  }

  def listTables(): Seq[String] =
    fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted

  def schemaOf(table: String): StructType = {
    require(fs.exists(metaFile(table)), s"no such table: $table")
    DataType.fromJson(readString(metaFile(table))).asInstanceOf[StructType]
  }

  // ---- schema evolution (ref dbcon/ddlpackage/ddl.y ALTER TABLE
  // grammar, executed by ddlproc/; here evolution is pure metadata —
  // data files are never rewritten, reads reconcile) ----

  /** ALTER TABLE ADD COLUMN: `colDdl` is a single `name TYPE`
    * definition. Existing data files simply lack the column; reads
    * project it as NULL (the catalog schema drives every scan), so
    * the operation is O(metadata) at any table size — same economics
    * as the reference's dictionary-backed add-column. */
  def addColumn(table: String, colDdl: String): StructType = {
    val add = TypeMapper.parseDdl(colDdl)
    require(add.fields.length == 1, s"expected one column definition, got: $colDdl")
    val cur = schemaOf(table)
    val f = add.fields.head
    require(!cur.fieldNames.contains(f.name), s"column exists: ${f.name}")
    val next = StructType(cur.fields :+ StructField(f.name, f.dataType, nullable = true))
    writeString(metaFile(table), next.json)
    next
  }

  /** ALTER TABLE DROP COLUMN: pure metadata — files written before
    * the drop keep the physical column, but every read projects the
    * catalog schema, which no longer includes it. */
  def dropColumn(table: String, name: String): StructType = {
    val cur = schemaOf(table)
    require(cur.fieldNames.contains(name), s"no such column: $name")
    require(cur.fields.length > 1, s"cannot drop the only column of $table")
    val next = StructType(cur.fields.filterNot(_.name == name))
    writeString(metaFile(table), next.json)
    next
  }

  /** Load a table as a DataFrame (empty-but-typed when no data yet).
    * The catalog schema is authoritative: files written before an ADD
    * COLUMN lack the field (read as NULL), files written before a
    * DROP COLUMN carry an extra physical column (projected away) —
    * both directions of schema evolution reconcile at scan time with
    * no data rewrite. */
  def load(table: String): DataFrame = {
    val schema = schemaOf(table)
    val fmt = formatOf(table)
    val loc = new HPath(whRoot, table)
    val hasData = fs.exists(loc) &&
      fs.listStatus(loc).exists(_.getPath.getName.endsWith(s".$fmt"))
    if (hasData) spark.read.schema(schema).format(fmt).load(tableLocation(table))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Register every catalog table as a temp view. */
  def registerViews(): Unit =
    listTables().foreach(t => load(t).createOrReplaceTempView(t))

  // ---- persisted SQL views (the reference supports views through the
  // MariaDB front end — view text stored in the .frm/catalog, expanded
  // at parse time; ha_mcs handles the expanded plan). Same model here:
  // the catalog persists the TEXT; `loadView` re-parses it against the
  // catalog's current tables, so views track schema evolution and
  // Catalyst optimizes THROUGH them (predicate pushdown into the
  // underlying scans — views are never materialized). ----

  private def viewFile(name: String): HPath = new HPath(metaDir, s"$name.view")

  def createView(name: String, sql: String): Unit = {
    require(!listTables().contains(name), s"view $name collides with a table")
    // validate eagerly against current tables — a typo fails at CREATE,
    // not first use (the reference parses view DDL the same way)
    registerViews()
    spark.sql(sql).schema
    writeString(viewFile(name), sql)
  }

  def listViews(): Seq[String] =
    if (!fs.exists(metaDir)) Seq.empty
    else fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".view")).map(_.stripSuffix(".view")).sorted

  def viewSql(name: String): String = readString(viewFile(name))

  def dropView(name: String): Unit = fs.delete(viewFile(name), false)

  /** Parse the stored text against the catalog's CURRENT tables (and
    * any other registered views of this session). */
  def loadView(name: String): DataFrame = {
    registerViews()
    spark.sql(viewSql(name))
  }

  // ---- partition management (ref dbcon/mysql/ha_mcs_partition.cpp:
  // 484-575 — enable/disable/drop partition; a disabled partition's
  // data stays on disk but is excluded from scans) ----

  private def disabledMarker(table: String, part: String): HPath =
    new HPath(new HPath(whRoot, table), s"$part/_disabled")

  /** Write a DataFrame hive-partitioned by a column. Subsequent
    * `load` calls prune partitions via the directory layout (the
    * extent-elimination analog made explicit on disk). */
  def writePartitioned(table: String, df: DataFrame, partitionCol: String,
      mode: String = "overwrite"): Unit =
    configureWriter(table, df.write.mode(mode).partitionBy(partitionCol))
      .save(tableLocation(table)) // format set by configureWriter

  /** List partition directory names (`col=value`). */
  def partitions(table: String): Seq[String] = {
    val loc = new HPath(whRoot, table)
    if (!fs.exists(loc)) Seq.empty
    else fs.listStatus(loc).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName).sorted
  }

  def disablePartition(table: String, part: String): Unit = {
    require(partitions(table).contains(part), s"no partition $part")
    writeString(disabledMarker(table, part), "")
  }

  def enablePartition(table: String, part: String): Unit =
    fs.delete(disabledMarker(table, part), false)

  /** Drop a partition's data permanently. */
  def dropPartition(table: String, part: String): Unit = {
    require(partitions(table).contains(part), s"no partition $part")
    fs.delete(new HPath(new HPath(whRoot, table), part), /* recursive = */ true)
  }

  /** Load a partitioned table, excluding disabled partitions; keeps
    * the partition column via basePath so partition pruning on it
    * still works downstream. */
  def loadPartitioned(table: String): DataFrame = {
    val enabled = partitions(table)
      .filterNot(p => fs.exists(disabledMarker(table, p)))
      .map(p => s"${tableLocation(table)}/$p")
    require(enabled.nonEmpty, s"no enabled partitions in $table")
    spark.read.option("basePath", tableLocation(table))
      .format(formatOf(table)).load(enabled: _*)
  }
}
