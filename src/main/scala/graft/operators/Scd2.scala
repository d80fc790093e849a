package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history builder — turn a raw
  * change log (key, ts, attributes...) into versioned dimension rows
  * with [valid_from, valid_to) intervals and a current flag, the
  * standard warehouse companion to the DML family's CDC output
  * (`VersionedTable.changesBetween` emits exactly such a log).
  *
  * No-op suppression first: a change row whose tracked attributes
  * null-safely equal the key's previous row is dropped (reloading the
  * same value must not open a new version). valid_to then comes from
  * the NEXT surviving change — both windows share one (key, ts)
  * partitioning, so the whole build is a single shuffle.
  */
object Scd2 {

  /** @param changes change log, one row per observed state
    * @param key     dimension key columns
    * @param ts      change-time column (valid_from of the version)
    * @param attrs   tracked attribute columns (define "changed")
    * @param tiebreak extra ordering columns after ts for same-instant
    *                 changes (last write wins within the order)
    */
  def build(changes: DataFrame, key: Seq[String], ts: String,
      attrs: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = (ts +: tiebreak).map(col)
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    val attrChanged = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val firstRow = lag(col(ts), 1).over(w).isNull
    val kept = changes
      .withColumn("_keep", firstRow || attrChanged)
      .filter(col("_keep")).drop("_keep")
    val w2 = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    kept
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((key.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
