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
    // Mixed-corpus guard (ADVICE r12): `only` writes selected tables
    // NEXT TO whatever dst already holds — two invocations at different
    // factors/modes would silently produce a referentially inconsistent
    // corpus (orders at factor 30 beside customer at factor 10 =
    // dangling o_custkey) that Tables.t happily reads. A manifest stamps
    // every run; a follow-up that disagrees on factor or mode fails
    // before writing a byte.
    val written = (Seq("region", "nation") ++ keyCols.keys).filter(wanted)
    // validate the stamp BEFORE writing a byte, but record the tables
    // only AFTER every write succeeded (ADVICE r13: stamping up front
    // made an interrupted run's manifest over-claim tables that were
    // never produced, and a later same-stamp run then merged the
    // phantom list)
    val merged = validateManifest(dst, factor, exactClones, written)
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
    writeManifest(dst, factor, exactClones, merged)
  }

  /** Validate `dst`'s stamp against (factor, mode) and return the
    * merged tables set — refuses a run whose factor or mode disagrees
    * with a previous stamp BEFORE any table is written (tables merge —
    * partial `only` refreshes at the SAME factor/mode are the
    * supported use). Writing the merged list is [[writeManifest]]'s
    * job, called only after every write succeeded, so a failed or
    * interrupted run never records tables it did not produce. */
  private[graft] def validateManifest(dst: String, factor: Int,
      exactClones: Boolean, tables: Seq[String]): Set[String] = {
    val mode = if (exactClones) "clones" else "variants"
    val path = java.nio.file.Paths.get(dst, "_scaleup_manifest.json")
    var all = tables.toSet
    if (java.nio.file.Files.exists(path)) {
      val prev = java.nio.file.Files.readString(path)
      def field(k: String): String =
        s""""$k":"?([^",}\\]]*)"?""".r.findFirstMatchIn(prev)
          .map(_.group(1)).getOrElse("")
      val (pf, pm) = (field("factor"), field("mode"))
      require(pf == factor.toString && pm == mode,
        s"$dst already holds a factor=$pf mode=$pm corpus; refusing to mix " +
          s"in factor=$factor mode=$mode tables (delete the dir or match the stamp)")
      all ++= s""""tables":\\[([^\\]]*)\\]""".r.findFirstMatchIn(prev)
        .map(_.group(1).split(',').map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
    }
    all
  }

  /** Stamp `dst` with (factor, mode, tables) — temp-file + atomic
    * rename, so a concurrent reader never sees a torn manifest. */
  private[graft] def writeManifest(dst: String, factor: Int,
      exactClones: Boolean, tables: Set[String]): Unit = {
    val mode = if (exactClones) "clones" else "variants"
    val path = java.nio.file.Paths.get(dst, "_scaleup_manifest.json")
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(s"._scaleup_manifest.${UUID()}.tmp")
    java.nio.file.Files.writeString(tmp,
      s"""{"factor":$factor,"mode":"$mode","tables":[""" +
        tables.toSeq.sorted.map("\"" + _ + "\"").mkString(",") + "]}\n")
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def UUID(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Parsed+validated CLI arguments; validation lives here (not in
    * main) so specs can exercise the fail-fast guards without touching
    * the shared SparkSession — ScaleUpSpec pins that contract. */
  private[graft] final case class Args(src: String, dst: String,
    factor: Int, exactClones: Boolean, only: Set[String])

  private[graft] def parseArgs(args: Array[String]): Args = {
    require(args.length >= 3,
      "usage: ScaleUp <src> <dst> <factor> [clones|variants] [table,table,...]")
    val Array(src, dst, f) = args.take(3)
    // fail fast on typos: a misspelled mode must not silently fall
    // back to variants (the twin-mass bench would measure the wrong
    // corpus shape), and a misspelled table must not exit 0 having
    // written nothing
    val mode = args.lift(3)
    require(mode.forall(Set("clones", "variants")),
      s"mode must be 'clones' or 'variants', got ${mode.get}")
    val only = args.lift(4).map(_.split(',').toSet).getOrElse(Set.empty)
    val known = keyCols.keySet ++ Set("region", "nation")
    require(only.subsetOf(known),
      s"unknown tables: ${(only -- known).mkString(",")}")
    Args(src, dst, f.toInt, mode.contains("clones"), only)
  }

  /** Usage: ScaleUp <src> <dst> <factor> [clones|variants] [table,table,...]
    * Argument validation MUST stay before session creation: the spec's
    * fail-fast test calls main directly, and a session created here
    * would be stopped by the finally and poison the shared test session. */
  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val spark = GraftSession.get()
    try scale(spark, a.src, a.dst, a.factor, a.exactClones, a.only)
    finally spark.stop()
  }
}
