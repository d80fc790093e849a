package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from the driver's fixture —
  * the harness for the round-11 scale-proof (BENCH_sf1.json): the
  * reference's own CI gates DBT-3 at SF1 (`mcs4007`), and the
  * sandbox testdata stops at sf0.1.
  *
  * Scaling law mirrors TPC-H dbgen: fact and dimension row counts
  * scale linearly with SF; nation/region stay fixed. Each replica `r`
  * offsets every scaled table's keys by `r * stride`, so referential
  * joins stay consistent WITHIN a replica and value-column
  * selectivity distributions (status flags, dates, prices, segments)
  * are preserved exactly — a q5-shaped join returns 10× the rows at
  * 10× the input, not a skewed blowup. KEY-modulo predicates (the
  * suite's `key % m = k` sampling splits) are residue-stable only
  * when the stride divides the modulus, so the stride is max_key + 1
  * rounded UP to a multiple of lcm(2,3,4,5,6,7,20) = 420 (every
  * modulus the suite uses): each replica then reproduces the base
  * residue classes exactly (ADVICE r11). Document text gets a short
  * per-replica suffix so the near-dup structure becomes clusters of
  * near-identical VARIANTS rather than exact clones (realistic dedup
  * work at scale); `n_chars` is kept consistent with the new length.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {

  /** Key columns to offset per table (all BIGINT in the fixture). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Offsets must be per-REFERENCED-table so foreign keys land on the
    * replica's own dimension rows: o_custkey shifts by customer's
    * stride, l_partkey by part's, etc. */
  private val strideOf: Map[String, String] = Map(
    "c_custkey" -> "customer", "s_suppkey" -> "supplier",
    "p_partkey" -> "part", "o_orderkey" -> "orders",
    "o_custkey" -> "customer", "l_orderkey" -> "orders",
    "l_partkey" -> "part", "l_suppkey" -> "supplier",
    "event_id" -> "events", "user_id" -> "events_user",
    "doc_id" -> "documents", "vec_id" -> "embeddings")

  def scale(spark: SparkSession, src: String, dst: String, factor: Int,
      exactClones: Boolean = false, only: Set[String] = Set.empty): Unit = {
    // one stride per key domain = max(key) + 1 in the source, rounded
    // up to a multiple of 420 = lcm(2,3,4,5,6,7,20) so every `key % m`
    // predicate the suite uses keeps its exact per-replica selectivity
    def mx(table: String, col: String): Long = {
      val raw = Tables.t(spark, src, table).agg(max(col)).head.getLong(0) + 1L
      (raw + 419L) / 420L * 420L
    }
    val stride: Map[String, Long] = Map(
      "customer" -> mx("customer", "c_custkey"),
      "supplier" -> mx("supplier", "s_suppkey"),
      "part" -> mx("part", "p_partkey"),
      "orders" -> mx("orders", "o_orderkey"),
      "events" -> mx("events", "event_id"),
      "events_user" -> mx("events", "user_id"),
      "documents" -> mx("documents", "doc_id"),
      "embeddings" -> mx("embeddings", "vec_id"))

    def replicas(table: String): DataFrame = {
      val base = Tables.t(spark, src, table)
      (0 until factor).map { r =>
        var df = base
        for (k <- keyCols(table))
          df = df.withColumn(k, col(k) + lit(r * stride(strideOf(k))))
        // default: per-replica text VARIANTS (realistic near-dup
        // clusters); clone mode keeps text byte-identical so every
        // replica set is an exact-twin class — the adversarial shape
        // the dedup twin collapse exists for
        if (table == "documents" && r > 0 && !exactClones)
          df = df.withColumn("text", concat(col("text"), lit(s" v$r")))
            .withColumn("n_chars",
              (col("n_chars") + lit(2 + s"$r".length)).cast("int"))
        df
      }.reduce(_ unionByName _)
    }

    val wanted: String => Boolean =
      if (only.isEmpty) _ => true else only.contains
    for (t <- Seq("region", "nation") if wanted(t)) // fixed: straight copy
      Tables.t(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    for (t <- keyCols.keys.toSeq.sorted if wanted(t)) {
      val parts = t match {
        case "lineitem" => 8 * factor / 10 max 8
        case "orders" | "events" => 4 * factor / 10 max 4
        case _ => 2
      }
      replicas(t).repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
      println(s"scaled $t x$factor")
    }
  }

  /** Usage: ScaleUp <src> <dst> <factor> [clones|variants] [table,table,...] */
  def main(args: Array[String]): Unit = {
    val Array(src, dst, f) = args.take(3)
    // fail fast on typos: a misspelled mode must not silently fall
    // back to variants (the twin-mass bench would measure the wrong
    // corpus shape), and a misspelled table must not exit 0 having
    // written nothing
    val mode = args.lift(3)
    require(mode.forall(Set("clones", "variants")),
      s"mode must be 'clones' or 'variants', got ${mode.get}")
    val exactClones = mode.contains("clones")
    val only = args.lift(4).map(_.split(',').toSet).getOrElse(Set.empty)
    val known = keyCols.keySet ++ Set("region", "nation")
    require(only.subsetOf(known),
      s"unknown tables: ${(only -- known).mkString(",")}")
    val spark = GraftSession.get()
    try scale(spark, src, dst, f.toInt, exactClones, only)
    finally spark.stop()
  }
}
