package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered data layout — the multi-column
  * generalization of the reference's extent elimination: ColumnStore
  * skips extents whose casual-partitioning min/max can't satisfy a
  * predicate (`versioning/BRM/extentmap.h`, the CP data in
  * `writeengine/bulk` loads), which works only for columns the load
  * order happens to cluster. Writing files along a Z-curve makes the
  * per-file parquet footer min/max TIGHT ON EVERY Z-DIMENSION AT
  * ONCE, so a selective predicate on any of them prunes most files
  * before a byte is read (Spark's scan does the pruning from the
  * same footer stats the layout tightens).
  *
  * Mechanics, all one distributed pass over the data plus one
  * metadata-sized agg:
  *  1. per-column min/max (one partial-aggregable agg → driver,
  *     like ANALYZE stats);
  *  2. each column linearly scaled to a `bits`-wide integer rank —
  *     plain codegen arithmetic, no window, no sort by rank
  *     (production knob for heavy skew: equi-depth boundaries from
  *     a sample/approx-quantile pass feeding the same interleave);
  *  3. ranks bit-interleaved into the Z-value — a shift/mask
  *     expression tree, codegen'd;
  *  4. `repartitionByRange` on the Z-value (Spark samples range
  *     boundaries — no global sort) + sort-within-partition, so
  *     each output file owns a contiguous Z-range.
  *
  * Nothing here is driver-bound beyond 2·|cols| doubles, and the
  * shuffle is the one any re-layout needs; the pass parallelizes to
  * any cluster width. LayoutSpec measures the contract: the fraction
  * of files a point/range predicate overlaps drops on every Z
  * dimension vs both the unsorted layout and a single-column sort's
  * non-leading dimensions. */
object ZOrder {

  /** Bit-interleaved Morton value of the given pre-scaled integer
    * rank columns (rank j contributes bit i to Z-bit i·n + j). */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    require(n >= 1, "need at least one column")
    require(n * bits <= 62, s"$n columns x $bits bits overflow a long")
    val terms = for {
      i <- 0 until bits
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + == OR
  }

  /** Linear rank of `c` in [lo, hi] scaled to `bits` bits. NULLs rank
    * 0 (they cluster together at the curve origin). */
  def linearRank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = hi - lo
    val maxRank = (1L << bits) - 1
    if (span <= 0) lit(0L)
    else coalesce(
      floor((c.cast("double") - lit(lo)) / lit(span) * maxRank).cast("long"),
      lit(0L))
  }

  /** The Z-value column for `df` over `cols` (numeric/date columns;
    * dates participate via their numeric cast). One stats action. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val stats = df.select(cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"_lo_$c"),
        max(col(c).cast("double")).as(s"_hi_$c"))): _*).first()
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      // all-NULL/empty column ⇒ span 0 ⇒ constant rank
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 0.0 else stats.getDouble(2 * i + 1)
      linearRank(col(c), lo, hi, bits)
    }
    interleave(ranks, bits)
  }

  /** Rewrite `df` into `numFiles` parquet files clustered along the
    * Z-curve of `cols`. Returns nothing; the layout IS the result —
    * subsequent reads prune by footer stats. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 12): Unit = {
    require(cols.nonEmpty, "need at least one z-order column")
    df.withColumn("_z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] of `c` from an already-written layout — the
    * footer-stat view a scan prunes with, reconstructed through the
    * `_metadata` pseudocolumn for measurement. */
  def fileSpans(df: DataFrame, c: String): DataFrame =
    df.select(col(c), col("_metadata.file_path").as("_f"))
      .groupBy(col("_f"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** How many files of the layout a range predicate lo ≤ c ≤ hi must
    * read (its span overlaps the query range) — the skipping metric. */
  def filesOverlapping(df: DataFrame, c: String, lo: Double, hi: Double): Long =
    fileSpans(df, c)
      .filter(col("lo").cast("double") <= hi && col("hi").cast("double") >= lo)
      .count()
}
