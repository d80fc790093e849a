package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salted equi-join — the explicit form of
  * what the reference's DiskJoinStep achieves by recursively
  * splitting oversized hash partitions (`docs/DiskJoinStep.md`) and
  * AQE achieves by splitting skewed shuffle blocks.
  *
  * GraftSession enables AQE skew-join, which is the right default;
  * this helper exists for the cases AQE cannot fix: a single hot key
  * whose BUILD side also explodes (AQE splits probe blocks, not the
  * matching build rows), or bucketed/streaming plans where AQE is
  * inactive. Left rows get a deterministic salt from their OTHER
  * columns (murmur of the whole row, stable across retries — never
  * rand(), which breaks task retry idempotency); right rows replicate
  * `salts` ways. Join key becomes (key, salt) so one hot key spreads
  * over `salts` tasks.
  */
object SkewJoin {

  /** Key-skew audit — the measurement that DECIDES whether a join
    * needs `saltedInnerJoin` (or a bigger AQE skew factor): per-key
    * counts reduced to one row of distribution shape — NDV, total,
    * max/mean ratio (the direct skew-factor input), p99-to-median,
    * and the Gini coefficient of the key mass. One partial-aggregable
    * groupBy + one aggregation over the NDV-sized count table; the
    * rank window runs on per-key counts, not rows. */
  def keySkewAudit(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key).as("_k"))
      .agg(count(lit(1)).as("_c"))
    // rank by (count, key) — deterministic; Gini needs the sorted index
    val w = Window.orderBy(col("_c"), col("_k"))
    counts.withColumn("_i", row_number().over(w))
      .agg(
        count(lit(1)).as("ndv"),
        sum(col("_c")).as("total"),
        max(col("_c")).as("max_key"),
        (max(col("_c")) / (sum(col("_c")) / count(lit(1)))).as("max_mean_ratio"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY _c)").as("p99_key"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _c)").as("p50_key"),
        round((lit(2) * sum(col("_i") * col("_c"))
            / (count(lit(1)) * sum(col("_c")))
          - (count(lit(1)) + 1) / count(lit(1)).cast("double")), 6).as("gini"))
  }

  /** Inner equi-join `left.key = right.key` with the left side salted
    * and the right side replicated `salts` ways. */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedLeft.join(replicatedRight,
        col(leftKey) === col(rightKey) && saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")
  }
}
