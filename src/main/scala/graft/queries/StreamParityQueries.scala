package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.dml.{IncrementalRollup, VersionedTable}
import graft.streaming.StreamingOps

/** Streaming↔batch parity at the DRIVER gate (SURVEY §2.10 was
  * spec-only through r8): a real Structured Streaming job —
  * AvailableNow trigger, checkpointed foreachBatch upsert into the
  * versioned table, incremental rollup folded per micro-batch
  * (`StreamingOps.upsertStreamWithRollup`) — whose final materialized
  * rollup is hash-compared against DuckDB computing the same
  * upsert-then-aggregate from first principles. This pins the whole
  * streaming face: source batching, exactly-once foreachBatch commit,
  * CDC-driven incremental refresh.
  *
  * Determinism under arbitrary micro-batch ORDER: the streamed rows
  * are written as four range-partitioned files (disjoint o_orderkey
  * ranges) and consumed one file per trigger, so every key appears in
  * exactly one batch and the final merged state is independent of the
  * order the source lists files in. The rollup refresh is a fold of
  * signed deltas — also order-independent across disjoint keys.
  */
object StreamParityQueries {
  import Q._

  val queries: Map[String, QFn] = Map(
    "q_stream_upsert_parity_v2" -> ((s, dir) => {
      // _v2: the avg column changed from round(…,6) to the unrounded
      // quotient (below) — a changed oracle result under the r9-
      // diagnosed per-NAME oracle-hash cache needs a fresh cache key.
      val root = Files.createTempDirectory("graft_stream_parity").toString
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // seed table: even keys
      val seed = orders.where(col("o_orderkey") % 2 === 0)
      val vt = VersionedTable.create(s, s"$root/table", seed)
      val view = IncrementalRollup.create(vt, s"$root/view",
        Seq("o_orderstatus"), Seq("o_totalprice"))
      // stream: keys % 3 == 0 with doubled price — overlaps half the
      // seed (updates) and inserts the odd multiples of 3
      val streamed = orders.where(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      streamed.repartitionByRange(4, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$root/incoming")
      val src = s.readStream.schema(streamed.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/incoming")
      StreamingOps.upsertStreamWithRollup(src, vt, "o_orderkey", view,
        s"$root/ckpt")
      // avg emitted UNROUNDED: both engines divide the identical exact
      // decimal sum by the identical count in IEEE double — bit-exact
      // — whereas round(double, 6) can differ by one ulp between
      // Spark's BigDecimal HALF_UP and DuckDB's scaled-float rounding
      // at near-half 6th decimals (the COMPAT #7/#12 discipline).
      view.read()
        .select(col("o_orderstatus"), col("_cnt").as("n"),
          col("_sum_o_totalprice").cast("double").as("sum_price"),
          (col("_sum_o_totalprice").cast("double") / col("_cnt"))
            .as("avg_price"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    // final state from first principles: streamed keys take the
    // doubled price (insert-or-replace), untouched seed keys keep
    // theirs; exact-decimal sum per the Q discipline
    "q_stream_upsert_parity_v2" ->
      """WITH final AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
