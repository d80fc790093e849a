package graft.plans

import org.apache.spark.sql.SparkSession

/** Managed-table lifecycle shared by [[Analyze]] and [[Bucketing]].
  *
  * A managed table's LOCATION can outlive its catalog entry: the
  * in-memory catalog dies with the session, the warehouse directory
  * does not, and a later CREATE refuses the orphaned path. The drop
  * must therefore remove BOTH — and resolve the location from the
  * catalog when the table exists (correct for any database), falling
  * back to the default database's `<warehouse>/<lowercased-name>`
  * layout only for unqualified names (r10 ADVICE: the former
  * hand-built path was wrong for qualified names and could target an
  * unrelated directory).
  */
object Warehouse {

  /** Drop `table` and delete its storage location. */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    val locStr: Option[String] =
      if (spark.catalog.tableExists(table))
        spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
          .find(_.getString(0) == "Location").map(_.getString(1))
      else if (!table.contains("."))
        Some(new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          table.toLowerCase).toString)
      else None // qualified + absent: nothing reliable to name
    spark.sql(s"DROP TABLE IF EXISTS $table")
    locStr.foreach { l =>
      val p = new org.apache.hadoop.fs.Path(l)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
