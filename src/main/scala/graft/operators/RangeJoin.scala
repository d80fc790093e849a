package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: points joined to intervals that contain them
  * (same key), without the nested-loop/cartesian plan a raw
  * inequality join degenerates to.
  *
  * Each interval explodes to the coarse time buckets it overlaps;
  * points map to their single bucket; the join is then a plain
  * equi-join on (key, bucket) with the precise containment predicate
  * as a residual filter. Per-task work is bounded by rows per
  * (key, bucket) — pick `bucketSeconds` ≈ the typical interval width
  * so each interval lands in O(1) buckets (the same bounded-blowup
  * trick as q_join_theta, generalized to arbitrary intervals; the
  * reference has no range operator at all — theta conditions are
  * post-join residuals there too, SURVEY §2.3).
  */
object RangeJoin {

  /** @param points    rows with `key` and a timestamp `ts`
    * @param intervals rows with `key`, `start`, `end` timestamps
    * @param bucketSeconds coarse bucket width; intervals wider than
    *   ~1000 buckets should use a larger width (explosion factor =
    *   interval width / bucketSeconds + 1)
    * @return inner join of points × containing intervals
    *         (start ≤ ts < end), all columns of both sides
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, ts: String, start: String, end: String,
      bucketSeconds: Long): DataFrame = {
    def bkt(c: Column): Column = (unix_timestamp(c) / bucketSeconds).cast("long")
    val p = points.withColumn("_bkt", bkt(col(ts)))
    val iv = intervals.withColumn("_bkt",
      explode(sequence(bkt(col(start)), bkt(col(end)))))
    p.join(iv,
      p(key) === iv(key) && p("_bkt") === iv("_bkt") &&
        col(ts) >= col(start) && col(ts) < col(end))
      .drop(iv(key)).drop("_bkt")
  }
}
