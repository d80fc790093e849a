package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dml.{IncrementalRollup, VersionedTable}

/** Incremental aggregate maintenance (`dml/IncrementalRollup.scala`):
  * after every DML mix, refresh-from-CDC must equal from-scratch. */
class RollupSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.select("l_returnflag", "_cnt", "_sum_l_quantity")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def freshDirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("rollup").toString
    (s"$root/table", s"$root/view")
  }

  test("insert / delete / update deltas all fold in exactly") {
    val (tloc, vloc) = freshDirs()
    val base = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val vt = VersionedTable.create(spark, tloc, base)
    val view = IncrementalRollup.create(vt, vloc,
      Seq("l_returnflag"), Seq("l_quantity"))
    assert(view.baseVersion === vt.currentVersion)

    // 1. pure insert
    vt.insert(base.where(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1))
    view.refresh()
    assert(canon(view.read()) === canon(view.full()))

    // 2. pure delete
    vt.delete(col("l_orderkey") % 5 === 0)
    view.refresh()
    assert(canon(view.read()) === canon(view.full()))

    // 3. update (CDC feeds delete+insert of the rewritten rows)
    vt.update(col("l_orderkey") % 3 === 1,
      Map("l_quantity" -> (col("l_quantity") * 2)))
    view.refresh()
    assert(canon(view.read()) === canon(view.full()))

    // 4. several versions folded in ONE refresh
    vt.insert(base.where(col("l_orderkey") % 11 === 3))
    vt.delete(col("l_orderkey") % 13 === 2)
    view.refresh()
    assert(canon(view.read()) === canon(view.full()))

    // refresh with no table movement is a no-op
    val v = view.baseVersion
    assert(view.refresh() === v)
  }

  test("fully-deleted group leaves the view; derived avg tracks sum/count") {
    val (tloc, vloc) = freshDirs()
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 5.0)).toDF("k", "v")
    val vt = VersionedTable.create(spark, tloc, df)
    val view = IncrementalRollup.create(vt, vloc, Seq("k"), Seq("v"))
    vt.delete(col("k") === "b")
    view.refresh()
    val rows = view.read().collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a"))
    assert(rows.head.getAs[Double]("_avg_v") === 15.0)
  }
}
