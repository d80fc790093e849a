package graft

/** Plan-audit main: prints the formatted physical plan of selected
  * queries so scan pushdown (PushedFilters/ReadSchema), join strategy,
  * and WholeStageCodegen spans can be inspected per change —
  * `.explain` is the engine's flight recorder for scale regressions.
  *
  * Usage: runMain graft.Explain [queryName ...] (default: headline set)
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
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
