package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, all three directions: for each left row, the single
  * right row with the greatest right.ts ≤ left.ts (`backward`), the
  * least right.ts ≥ left.ts (`forward`), or whichever of the two is
  * closer (`nearest`) for the same key — the time-series join Spark
  * has no operator for (the reference has none either; listed in the
  * engine charter as a required custom operator).
  *
  * Formulation is the scalable union-and-carry shape, NOT a per-row
  * subquery or range cross-join:
  *   1. tag both inputs and union them (schema-aligned, right
  *      payload as one struct);
  *   2. one shuffle+sort by (key, ts, side) — right rows sort BEFORE
  *      left rows at equal ts so "≤" includes same-instant matches;
  *   3. running `last(right_payload, ignoreNulls)` over the ordered
  *      partition carries the most recent right row forward;
  *   4. keep the left rows.
  * Cost: one shuffle of |L|+|R| narrow rows and a per-key sort —
  * same complexity class as a sort-merge join, no quadratic term,
  * skew bounded by per-key row counts (salt upstream if one key
  * dominates). An optional `tolerance` drops matches older than
  * left.ts − tolerance, evaluated post-carry at zero extra cost.
  */
object AsOfJoin {

  /** @param left      left rows; must contain `key` and `ts`
    * @param right     right rows; must contain `key` and `ts`
    * @param key       equi-key column name (both sides)
    * @param ts        event-time column name (both sides)
    * @param tolerance max allowed left.ts − right.ts, as a Column
    *                  interval (e.g. `expr("INTERVAL 1 HOUR")`), or
    *                  null for unbounded look-back
    * @return left rows plus `_asof` struct of the matched right row
    *         (null when no match), right's ts as `_asof_ts`
    */
  def backward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      tolerance: Column = null): DataFrame = {
    val carried = unionCarry(left, right, key, ts, forward = false)
    val result = carried.filter(col("_side") === 1).drop("_side", "_r")
      .withColumnRenamed("_carry", "_asof")
    val tolApplied =
      if (tolerance == null) result
      else result.withColumn("_asof",
        when(col("_asof._rts") >= col(ts) - tolerance, col("_asof")))
    tolApplied.withColumn("_asof_ts", col("_asof._rts"))
  }

  /** Forward as-of: the single right row with the LEAST right.ts ≥
    * left.ts per key — the "next reading after the request" join.
    * Same union-and-carry shape run in reverse time order (right rows
    * still sort before left at equal ts, so "≥" keeps same-instant
    * matches). Optional `tolerance` drops matches beyond
    * left.ts + tolerance. */
  def forward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      tolerance: Column = null): DataFrame = {
    val carried = unionCarry(left, right, key, ts, forward = true)
    val result = carried.filter(col("_side") === 1).drop("_side", "_r")
      .withColumnRenamed("_carry", "_asof")
    val tolApplied =
      if (tolerance == null) result
      else result.withColumn("_asof",
        when(col("_asof._rts") <= col(ts) + tolerance, col("_asof")))
    tolApplied.withColumn("_asof_ts", col("_asof._rts"))
  }

  /** Nearest as-of: whichever of the backward / forward candidates is
    * closer in |Δts|; an exact-distance tie resolves BACKWARD (the
    * convention pandas `merge_asof(direction='nearest')` documents).
    * Both carries ride the SAME union and key partitioning — one
    * shuffle, two per-key sorts (asc + desc) — never two joins.
    * `tolerance` (if given) bounds the distance on both sides. */
  def nearest(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      tolerance: Column = null): DataFrame = {
    val both = unionCarry2(left, right, key, ts)
    val result = both.filter(col("_side") === 1).drop("_side", "_r")
    val back0 = col("_carry_b")
    val fwd0 = col("_carry_f")
    val back = if (tolerance == null) back0
      else when(back0("_rts") >= col(ts) - tolerance, back0)
    val fwd = if (tolerance == null) fwd0
      else when(fwd0("_rts") <= col(ts) + tolerance, fwd0)
    // distances are non-negative by construction; backward wins ties
    val pick = when(back.isNull, fwd).when(fwd.isNull, back)
      .when(col(ts) - back("_rts") <= fwd("_rts") - col(ts), back)
      .otherwise(fwd)
    result.withColumn("_asof", pick)
      .drop("_carry_b", "_carry_f")
      .withColumn("_asof_ts", col("_asof._rts"))
  }

  /** Tag, align, and union the two inputs; carry the most recent
    * (or, forward, the next) right payload onto every row as
    * `_carry`. Shared engine of all three directions. */
  private def unionCarry(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, forward: Boolean): DataFrame = {
    val unioned = aligned(left, right, key, ts)
    val ord = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(col(key))
      .orderBy(ord, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("_carry", last(col("_r"), ignoreNulls = true).over(w))
  }

  /** Both carries over one union: `_carry_b` (backward) and
    * `_carry_f` (forward). Spark plans ONE exchange on `key` and two
    * in-partition sorts — cheaper than running the union twice. */
  private def unionCarry2(
      left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame = {
    val unioned = aligned(left, right, key, ts)
    val wb = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_carry_b", last(col("_r"), ignoreNulls = true).over(wb))
      .withColumn("_carry_f", last(col("_r"), ignoreNulls = true).over(wf))
  }

  private def aligned(
      left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == ts)
    val rightStruct = struct(col(ts).as("_rts") +: rightPayloadCols.map(col).toIndexedSeq: _*)
    val rightStructType = right.select(rightStruct).schema.head.dataType

    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rightStructType))
    // right contributes (key, ts, _side, _r); left's other columns null
    val leftOnly = left.columns.filterNot(c => c == key || c == ts)
    val r0 = right.select(col(key), col(ts), lit(0).as("_side"), rightStruct.as("_r"))
    leftOnly.foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col).toIndexedSeq: _*)
      .unionByName(l.select(l.columns.map(col).toIndexedSeq: _*))
  }
}
