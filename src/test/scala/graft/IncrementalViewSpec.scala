package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.dml.{IncrementalJoinRollup, VersionedTable}

/** IncrementalJoinRollup: CDC-delta maintenance of a two-table join
  * rollup must equal the from-scratch join at every refresh, under
  * inserts/deletes/updates on EITHER side, including multiset
  * duplicates and groups that vanish. */
class IncrementalViewSpec extends SparkSpec {

  private def freshRoot() =
    Files.createTempDirectory("graft_ijr").toString

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.select(col("o_orderstatus"), col("l_returnflag"),
      col("_cnt"), col("_sum_l_quantity").cast("string"),
      col("_sum_o_totalprice").cast("string")).collect().toSet

  private def fixtures() = {
    val root = freshRoot()
    val a0 = Tables.t(spark, sfDir, "orders")
      .where(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val b0 = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_orderkey") % 7 =!= 0)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
    val a = VersionedTable.create(spark, s"$root/a", a0)
    val b = VersionedTable.create(spark, s"$root/b", b0)
    val v = IncrementalJoinRollup.create(a, b, s"$root/view",
      leftKey = "o_orderkey", rightKey = "l_orderkey",
      groupCols = Seq("o_orderstatus", "l_returnflag"),
      sumCols = Seq("l_quantity", "o_totalprice"))
    (root, a, b, v)
  }

  test("delta refresh equals from-scratch join after every transaction on either side") {
    val (_, a, b, v) = fixtures()
    val orders = Tables.t(spark, sfDir, "orders")
    val items = Tables.t(spark, sfDir, "lineitem")

    // left insert
    a.insert(orders.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") + 1).as("o_totalprice")))
    v.refresh()
    assert(canon(v.read()) === canon(v.full()), "after left insert")

    // right delete
    b.delete(col("l_orderkey") % 5 === 0)
    v.refresh()
    assert(canon(v.read()) === canon(v.full()), "after right delete")

    // left update (CDC delete+insert through the join)
    a.update(col("o_orderkey") % 3 === 1,
      Map("o_totalprice" -> (col("o_totalprice") * 2)))
    v.refresh()
    assert(canon(v.read()) === canon(v.full()), "after left update")

    // right insert with MULTISET duplicates of surviving rows
    b.insert(items.where(col("l_orderkey") % 7 === 0 && col("l_orderkey") % 2 === 1)
      .select(col("l_orderkey"), col("l_returnflag"),
        (col("l_quantity") + 5).as("l_quantity")))
    v.refresh()
    assert(canon(v.read()) === canon(v.full()), "after right insert")
  }

  test("refresh is a no-op when neither table moved; both-side batch composes") {
    val (_, a, b, v) = fixtures()
    val before = v.baseVersions
    assert(v.refresh() === before, "no-op refresh must keep base versions")
    // both sides move between refreshes → one refresh folds both CDCs
    a.delete(col("o_orderkey") % 11 === 0)
    b.delete(col("l_orderkey") % 11 === 3)
    v.refresh()
    assert(canon(v.read()) === canon(v.full()), "one refresh over both-side deltas")
  }

  test("a group whose last joined rows are deleted leaves the view") {
    val (_, _, b, v) = fixtures()
    val flags = v.read().select(col("l_returnflag")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(flags.nonEmpty)
    val victim = flags.head
    b.delete(col("l_returnflag") === victim)
    v.refresh()
    val left = v.read().select(col("l_returnflag")).distinct()
      .collect().map(_.getString(0))
    assert(!left.contains(victim), s"group $victim must leave the view")
    assert(canon(v.read()) === canon(v.full()))
  }
}
