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
