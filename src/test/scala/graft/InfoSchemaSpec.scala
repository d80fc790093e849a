package graft

import org.apache.spark.sql.functions._
import graft.sources.InfoSchema

/** INFORMATION_SCHEMA analog (`sources/InfoSchema.scala`) — the
  * footer-reading invariants the DuckDB oracle can't see: multi-file
  * tables, agreement with the data-path row counts, and the
  * distributed read shape. */
class InfoSchemaSpec extends SparkSpec {

  test("extents: per-column value counts equal the table's row count") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val n = li.count()
    val perCol = InfoSchema.extents(spark, sfDir, Seq("lineitem"))
      .groupBy("column_name").agg(sum("num_values").as("nv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perCol.nonEmpty)
    // flat schema + no nulls-only chunks: every column carries n values
    perCol.foreach { case (c, nv) => assert(nv === n, s"column $c") }
  }

  test("files + tables rollups agree with the data path") {
    val fl = InfoSchema.files(spark, sfDir, Seq("orders", "events"))
      .collect().map(r => (r.getString(0), r.getLong(4))) // (table, rows)
    val byTable = fl.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byTable("orders") === Tables.t(spark, sfDir, "orders").count())
    assert(byTable("events") === Tables.t(spark, sfDir, "events").count())
    val tb = InfoSchema.tables(spark, sfDir, Seq("orders"))
      .collect().head
    assert(tb.getAs[Long]("rows") === byTable("orders"))
  }

  test("multi-file table: every part file surfaces as its own extent set") {
    val root = java.nio.file.Files.createTempDirectory("infoschema").toString
    try {
      Tables.t(spark, sfDir, "nation").repartition(4)
        .write.mode("overwrite").parquet(s"$root/nation.parquet")
      val files = InfoSchema.files(spark, root, Seq("nation")).collect()
      assert(files.length === 4)
      assert(files.map(_.getAs[Long]("rows")).sum === 25L)
      val ext = InfoSchema.extents(spark, root, Seq("nation"))
      // 4 files x |columns| chunks at one row group per small file
      val cols = Tables.t(spark, sfDir, "nation").columns.length
      assert(ext.count() === 4L * cols)
      // stats decode: global min/max of n_nationkey across extents
      val keys = ext.where(col("column_name") === "n_nationkey")
      val mins = keys.agg(min(col("min_value").cast("long"))).head.getLong(0)
      val maxs = keys.agg(max(col("max_value").cast("long"))).head.getLong(0)
      assert(mins === 0L && maxs === 24L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("columns: footer schema matches the engine-visible schema") {
    val cols = InfoSchema.columns(spark, sfDir, Seq("documents")).collect()
      .sortBy(_.getAs[Int]("ordinal"))
    assert(cols.map(_.getString(1)).toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val byName = cols.map(r => r.getString(1) -> r.getString(3)).toMap
    assert(byName("doc_id") === "INT64")
    assert(byName("text") === "BYTE_ARRAY")
  }
}
