package graft

/** Plan-audit main: prints the formatted physical plan of selected
  * queries so scan pushdown (PushedFilters/ReadSchema), join strategy,
  * and WholeStageCodegen spans can be inspected per change —
  * `.explain` is the engine's flight recorder for scale regressions.
  *
  * Usage: runMain graft.Explain [queryName ...] (default: headline set)
  *
  * SPARK_GRAFT_EXPLAIN_CONF="k=v;k=v" sets session confs before
  * planning — used to dump BOTH sides of a scale-adaptive gate (e.g.
  * the rank-map path that a small fixture's byte floor would route
  * around) so plans/ can show the at-scale plan from gate-scale data.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach { kvs =>
      kvs.split(';').filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      }
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_shipping", "q5_region", "q10_returns", "q_scan_project",
        "q_dedup_minhash", "q_ann_lsh", "q_join_theta")
    names.foreach { n =>
      println(s"\n=== $n ===")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
