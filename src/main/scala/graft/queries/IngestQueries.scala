package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Catalog, CsvImporter}

/** Ingest round trip as an oracle-checked query: export `nation` to
  * CSV, CREATE TABLE via MariaDB DDL, cpimport-load it, and run a
  * join+agg over the imported table. The oracle runs the same SQL
  * over the ORIGINAL parquet — ingest must be lossless for the hashes
  * to match (SURVEY M0; ref `writeengine/bulk/cpimport.cpp`,
  * `dbcon/ddlpackage/ddl.y`). */
object IngestQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_ingest_roundtrip" -> ((s, dir) => {
      val wh = Files.createTempDirectory("graft_ingest_wh").toString
      val csvDir = Files.createTempDirectory("graft_ingest_csv").toString
      val cat = new Catalog(wh, s)
      t(s, dir, "nation").coalesce(1).write.mode("overwrite")
        .option("sep", "|").csv(csvDir)
      cat.createTable("nation_in",
        "n_nationkey INT NOT NULL, n_name VARCHAR(25) NOT NULL, n_regionkey INT NOT NULL")
      CsvImporter.importCsv(s, cat, "nation_in", csvDir, delimiter = "|")
      cat.load("nation_in")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          d(sum(col("n_nationkey").cast("decimal(18,2)"))).as("key_sum"))
        .orderBy(col("r_name"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ingest_roundtrip" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        |  CAST(SUM(CAST(n_nationkey AS DECIMAL(18,2))) AS DOUBLE) AS key_sum
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
