package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

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

  /** Equi-depth rank of `c` against precomputed quantile `boundaries`
    * (sorted ascending): rank = the boundary insertion point, i.e.
    * each rank bucket holds ~equal ROW MASS rather than equal value
    * span. This is the skew knob linear ranks lack: under a zipf
    * column, `linearRank` collapses the dense head onto one rank (the
    * head spans a sliver of [min,max]) and every file overlaps every
    * head query; equi-depth boundaries spend their resolution where
    * the rows are. Evaluated as a native binary-search kernel —
    * O(log B) per row inside whole-stage codegen, no interpreted HOF
    * over the boundary array. NULLs rank 0 (curve origin). */
  def equiDepthRank(c: Column, boundaries: Array[Double]): Column =
    coalesce(call_function("bucket_rank", c.cast("double"), lit(boundaries)), lit(0L))

  /** Native expression behind `bucket_rank` (registered in
    * GraftExtensions): Arrays.binarySearch over a broadcast-literal
    * boundary array. */
  case class BucketRank(child: Expression, boundaries: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "bucket_rank"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

    override def nullSafeEval(input: Any): Any =
      ZOrderKernels.rank(boundaries, input.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bucketBounds", boundaries, "double[]")
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = graft.sources.ZOrderKernels.rank($ref, $c);")
    }
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

  /** Equi-depth Z-value: per-column quantile boundaries (ONE
    * approx_quantile pass over ALL columns — a bounded-size sketch,
    * not a sort) feed the binary-search rank, then the same
    * interleave. Use when a Z dimension is heavily skewed; for
    * near-uniform data `zValue`'s two-scalar stats pass is cheaper
    * with the same layout. */
  def zValueEquiDepth(df: DataFrame, cols: Seq[String], bits: Int,
      relativeError: Double = 0.001): Column = {
    val nBounds = (1 << bits) - 1
    val probs = (1 to nBounds).map(_.toDouble / (1 << bits)).toArray
    val asDouble = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    val bounds = asDouble.stat.approxQuantile(cols.toArray, probs, relativeError)
    interleave(cols.zip(bounds).map { case (c, b) => equiDepthRank(col(c), b) }, bits)
  }

  /** Rewrite `df` into `numFiles` parquet files clustered along the
    * Z-curve of `cols`. Returns nothing; the layout IS the result —
    * subsequent reads prune by footer stats. `equiDepth` switches the
    * per-column rank from linear [min,max] scaling to quantile
    * buckets (the skew-proof variant). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 12, equiDepth: Boolean = false): Unit = {
    require(cols.nonEmpty, "need at least one z-order column")
    val z = if (equiDepth) zValueEquiDepth(df, cols, bits) else zValue(df, cols, bits)
    df.withColumn("_z", z)
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

/** Top-level (static-forwarder-visible) kernel shared by BucketRank's
  * interpreted eval and its generated code. */
object ZOrderKernels {
  /** Insertion-point rank of `v` among sorted `bounds`: 0 ≤ rank ≤
    * bounds.length; deterministic under duplicate boundaries. */
  def rank(bounds: Array[Double], v: Double): Long = {
    val i = java.util.Arrays.binarySearch(bounds, v)
    if (i >= 0) i.toLong + 1L else -(i.toLong) - 1L
  }
}
