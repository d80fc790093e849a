package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval-OVERLAP join — both sides are intervals, pairs
  * emitted when they intersect: `a.start ≤ b.end AND b.start ≤ a.end`
  * (closed intervals; touching endpoints match). The two-sided
  * generalization of [[RangeJoin.pointInInterval]] — the session-vs-
  * session / outage-vs-request shape every event warehouse needs and
  * the reference (like stock Spark) can only plan as a nested loop
  * (SURVEY §2.3: theta conditions are post-join residuals there too).
  *
  * Mechanics: each interval explodes to the coarse buckets it covers;
  * candidates meet in shared buckets as a plain equi-join on
  * (key, bucket). An overlapping pair shares EVERY bucket between
  * max(starts) and min(ends) — so the pair is emitted exactly once by
  * keeping only the bucket CONTAINING max(starts) (that bucket is
  * covered by both sides iff they overlap; no global dedup shuffle).
  *
  * Cost: one shuffle on (key, bucket); per-task work bounded by rows
  * per (key, bucket). Explosion factor = width/bucketSeconds + 1 —
  * pick the grain near the typical interval width; heavily skewed
  * widths want a two-tier grain (explode long intervals at a coarser
  * grain into a second join and union — same trick, not built in). */
object IntervalJoin {

  /** @param left/right rows with `key`, `start`, `end` timestamp cols
    *   (column NAMES are shared; the frames are aliased internally
    *   and surviving columns come back prefixed `l_`/`r_`)
    * @return inner overlap join; every left/right column prefixed */
  def overlap(
      left: DataFrame, right: DataFrame,
      key: String, start: String, end: String,
      bucketSeconds: Long): DataFrame = {
    def bkt(c: Column): Column = (unix_timestamp(c) / bucketSeconds).cast("long")
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    val l = prefixed(left, "l_")
      .withColumn("_bkt", explode(sequence(bkt(col(s"l_$start")), bkt(col(s"l_$end")))))
    val r = prefixed(right, "r_")
      .withColumn("_bkt", explode(sequence(bkt(col(s"r_$start")), bkt(col(s"r_$end")))))
    l.join(r,
      col(s"l_$key") === col(s"r_$key") && l("_bkt") === r("_bkt") &&
        // overlap predicate (residual)
        col(s"l_$start") <= col(s"r_$end") && col(s"r_$start") <= col(s"l_$end") &&
        // exactly-once: only the bucket holding max(starts) emits
        l("_bkt") === bkt(greatest(col(s"l_$start"), col(s"r_$start"))))
      .drop(l("_bkt")).drop(r("_bkt"))
  }
}
