package graft

import org.apache.spark.sql.functions._
import graft.plans.ResourceGovernor

/** Admission-control gate (ResourceManager refusal analog).
  * See plans/ResourceGovernor.scala + docs/MEMORY.md. */
class GovernorSpec extends SparkSpec {

  private def withBudget[A](bytes: Long)(f: => A): A = {
    spark.conf.set("spark.graft.admission.maxScanBytes", bytes.toString)
    try f
    finally spark.conf.unset("spark.graft.admission.maxScanBytes")
  }

  private def rejected(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[ResourceGovernor.QueryRejectedException]) return true
      c = c.getCause
    }
    false
  }

  test("price: file scan prices at its on-disk bytes; local data prices 0") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val p = ResourceGovernor.price(li.groupBy("l_returnflag").count())
    val onDisk = new java.io.File(s"$sfDir/lineitem.parquet").length
    assert(p === onDisk)
    import spark.implicits._
    assert(ResourceGovernor.price(Seq(1, 2, 3).toDF("x")) === 0L)
  }

  test("over-budget query is refused before execution; unset budget admits") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val e = intercept[Throwable] {
      withBudget(1024) { li.agg(sum("l_quantity")).collect() }
    }
    assert(rejected(e), s"expected QueryRejectedException in cause chain, got $e")
    // same query, no budget: runs
    assert(li.agg(sum("l_quantity")).collect().length === 1)
  }

  test("within-budget query admits") {
    val li = Tables.t(spark, sfDir, "lineitem")
    withBudget(1L << 40) {
      assert(li.groupBy("l_returnflag").count().collect().nonEmpty)
    }
  }

  test("partition pruning lowers the admission price: a pruned query admits under a budget the full scan busts") {
    val root = java.nio.file.Files.createTempDirectory("govern").toString
    try {
      val li = Tables.t(spark, sfDir, "lineitem")
      li.withColumn("part", col("l_orderkey") % 8)
        .write.partitionBy("part").mode("overwrite").parquet(root)
      val all = spark.read.parquet(root)
      val priceAll = ResourceGovernor.price(all.groupBy("l_returnflag").count())
      val pruned = all.where(col("part") === 3).groupBy("l_returnflag").count()
      val pricePruned = ResourceGovernor.price(pruned)
      assert(pricePruned > 0 && pricePruned < priceAll / 2,
        s"pruned=$pricePruned all=$priceAll")
      // budget between the two: pruned admits, full scan is refused
      val budget = (pricePruned + priceAll) / 2
      withBudget(budget) {
        assert(pruned.collect().nonEmpty)
        val e = intercept[Throwable] {
          all.groupBy("l_returnflag").count().collect()
        }
        assert(rejected(e), s"expected rejection of the full scan, got $e")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
