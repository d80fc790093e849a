package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Pin the TRAINED-oracle corpus dir to this run's sfDir so the
    // oracle literals come from the same TrainedModels cache entries
    // the query runs populate (see LlmQueries.oracleSfDir).
    sys.props("graft.oracle.sfDir") = sfDir
    // optional 3rd arg: comma-separated name prefixes — local iteration
    // only (the driver always runs the full suite with 2 args)
    val keep: String => Boolean = args.lift(2) match {
      case Some(prefixes) =>
        val ps = prefixes.split(",").toSeq
        name => ps.exists(name.startsWith)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same engine config as Bench and the library surface — round 1
    // verified a differently-configured session than it advertised.
    val spark = GraftSession.get(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failed query must still surface in the driver's CORRECTNESS
        // report: write a readable 1-row parquet whose schema can never
        // match an oracle, so the failure shows as a red row instead of
        // an absent one. Round 7 hid a 13-query regression inside an
        // "0 failures" report by writing nothing here.
        try {
          import spark.implicits._
          Seq(Option(e.getMessage).getOrElse(e.getClass.getName))
            .toDF("_verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
