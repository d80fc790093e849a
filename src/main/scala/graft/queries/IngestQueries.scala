package graft.queries

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
    "q_ingest_roundtrip" -> ((s, dir) => Q.withScratch(s, "graft_ingest") { rootP =>
      val wh = s"$rootP/wh"
      val csvDir = s"$rootP/csv"
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
    }),
    "q_crossengine_join" -> ((s, dir) => {
      // (no scratch: the Derby side is in-memory)
      // CrossEngineStep analog, driver-gated (ref
      // `dbcon/joblist/crossenginestep.cpp:822`): a FOREIGN table —
      // an embedded Derby instance standing in for the reference's
      // MySQL-protocol side — joins a columnar parquet table through
      // the JDBC source. The foreign rows are a fixed literal set, so
      // the oracle spells the same rows inline; the foreign side is
      // broadcast (5 rows — the dimension side of a cross-engine join
      // should never shuffle the columnar fact side).
      import graft.sources.CrossEngine
      val url = "jdbc:derby:memory:graftq;create=true"
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        try st.execute("CREATE TABLE region_votes (r_regionkey INT, votes INT)")
        catch { case _: java.sql.SQLException => st.execute("DELETE FROM region_votes") }
        (0 until 5).foreach(k =>
          st.execute(s"INSERT INTO region_votes VALUES ($k, ${k * 10 + 1})"))
        st.close()
      } finally c.close()
      val foreign = CrossEngine.table(s, url, "region_votes", user = "", password = "")
        .toDF("f_regionkey", "votes")
      t(s, dir, "region")
        .join(broadcast(foreign), col("r_regionkey") === col("f_regionkey"))
        .select(col("r_name"), col("votes").cast("int").as("votes"))
        .orderBy(col("r_name"))
    }),
    "q_ingest_charset" -> ((s, dir) => Q.withScratch(s, "graft_ingest_cs") { rootP =>
      // Non-UTF8 bulk load (VERDICT r12 missing #1: cpimport converts
      // the client charset while loading, `writeengine/bulk/
      // we_bulkload.cpp`; charset zoo in `utils/common/collation.h`):
      // a latin1 (ISO-8859-1) CSV with accented payload must decode to
      // the exact UTF-8 strings — value-checked against
      // first-principles oracle literals — and the pinned boolean
      // shows the charset option is load-bearing (a UTF-8 misread of
      // the same bytes mangles every accent into U+FFFD).
      val wh = s"$rootP/wh"
      val csv = s"$rootP/latin1"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(csv))
      val bases = Seq("Café", "Müller", "Ångström", "Peña")
      val lines = (0 until 200).map(i => s"$i|${bases(i % 4)}-$i")
      java.nio.file.Files.write(java.nio.file.Paths.get(csv, "part0.csv"),
        lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val cat = new Catalog(wh, s)
      cat.createTable("latin1_in", "id INT NOT NULL, name VARCHAR(32) NOT NULL")
      CsvImporter.importCsv(s, cat, "latin1_in", csv, delimiter = "|",
        charset = "ISO-8859-1")
      val loaded = cat.load("latin1_in")
      val misread = s.read.schema("id INT, name STRING")
        .option("sep", "|").csv(csv)
      val misreadDiffers = misread.select(md5(col("name")))
        .except(loaded.select(md5(col("name")))).count() > 0
      loaded
        .groupBy(substring_index(col("name"), "-", 1).as("base"))
        .agg(count(lit(1)).as("n"),
          sum(col("id")).cast("long").as("id_sum"),
          min(col("name")).as("first_name"),
          max(col("name")).as("last_name"))
        .withColumn("utf8_misread_differs", lit(misreadDiffers))
        .orderBy(col("base"))
    }),
    "q_ingest_jsonl" -> ((s, dir) => {
      // JSONL roundtrip — the training-data interchange format,
      // first-class next to the CSV bulk loader (the reference's
      // cpimport is delimiter-only). Write through the engine, read
      // back with an EXPLICIT schema (schema inference is a second
      // full scan at corpus scale), and prove content fidelity through
      // JSON string escaping with per-source md5 checksums against the
      // original table.
      Q.withScratch(s, "graft_ingest_jsonl") { rootP =>
      val jd = rootP.toString
      t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").json(jd)
      val back = s.read
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .json(jd)
      back.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text")).cast("long")).as("sum_len"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"),
          countDistinct(md5(col("text"))).cast("long").as("n_distinct"))
        .orderBy(col("source"))
      }
    })
  )

  val oracle: Map[String, String] = Map(
    // the foreign Derby rows are a fixed literal set → spelled inline
    "q_crossengine_join" ->
      """SELECT r.r_name, v.votes
        |FROM region r
        |JOIN (VALUES (0, 1), (1, 11), (2, 21), (3, 31), (4, 41)) v(k, votes)
        |  ON r.r_regionkey = v.k
        |ORDER BY r.r_name""".stripMargin,
    "q_ingest_roundtrip" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        |  CAST(SUM(CAST(n_nationkey AS DECIMAL(18,2))) AS DOUBLE) AS key_sum
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_ingest_charset" ->
      """WITH rows_ AS (
        |  SELECT i::INT AS id,
        |    ['Café','Müller','Ångström','Peña'][(i % 4 + 1)::INT]
        |      || '-' || i AS name
        |  FROM range(0, 200) t(i))
        |SELECT split_part(name, '-', 1) AS base,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(id) AS BIGINT) AS id_sum,
        |  min(name) AS first_name, max(name) AS last_name,
        |  TRUE AS utf8_misread_differs
        |FROM rows_ GROUP BY 1 ORDER BY base""".stripMargin,
    "q_ingest_jsonl" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
        |  MIN(md5(text)) AS min_md5, MAX(md5(text)) AS max_md5,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
  )
}
