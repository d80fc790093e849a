package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the single right row
  * with the greatest right.ts ≤ left.ts for the same key — the
  * time-series join Spark has no operator for (the reference has
  * none either; listed in the engine charter as a required custom
  * operator).
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
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == ts)
    val rightStruct = struct(col(ts).as("_rts") +: rightPayloadCols.map(col).toIndexedSeq: _*)
    val rightStructType = right.select(rightStruct).schema.head.dataType

    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rightStructType))
    // right contributes (key, ts, _side, _r); left's other columns null
    val leftOnly = left.columns.filterNot(c => c == key || c == ts)
    val r0 = right.select(col(key), col(ts), lit(0).as("_side"), rightStruct.as("_r"))
    val rAligned = leftOnly.foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.union(rAligned)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))

    val result = carried.filter(col("_side") === 1).drop("_side", "_r")
    val tolApplied =
      if (tolerance == null) result
      else result.withColumn("_asof",
        when(col("_asof._rts") >= col(ts) - tolerance, col("_asof")))
    tolApplied.withColumn("_asof_ts", col("_asof._rts"))
  }
}
