package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes `digests.json`: a self-computed canonical digest per
  * query (row count, name-sorted schema, md5 over the canonical cell
  * stream in STORED row order, bit-exact doubles via raw IEEE bits,
  * decimals as unscaled-int:scale). Round 9 adjudicated 8 gate-red
  * rows as bit-exact engine-correct only through live replays; this
  * sidecar makes any future red row adjudicable from committed
  * artifacts alone — the digest pins exactly what the engine stored,
  * independent of any driver-side caching.
  */
object Verify {

  /** Canonical cell rendering — engine-independent and bit-exact:
    * doubles/floats as raw IEEE-754 bits (so -0.0 ≠ 0.0 and NaN is
    * exact), decimals as unscaled:scale, binary as hex, temporal via
    * ISO toString, nested values recursively. */
  def canon(v: Any): String = v match {
    case null => "∅"
    case d: java.lang.Double =>
      f"d${java.lang.Double.doubleToRawLongBits(d)}%016x"
    case f: java.lang.Float =>
      f"f${java.lang.Float.floatToRawIntBits(f)}%08x"
    case d: java.math.BigDecimal => s"${d.unscaledValue}:${d.scale}"
    case d: scala.math.BigDecimal =>
      s"${d.underlying.unscaledValue}:${d.underlying.scale}"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString("x[", "", "]")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canon).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "→" + canon(x) }
        .sorted.mkString("{", ",", "}")
    case x => String.valueOf(x)
  }

  /** Digest of a written query dump, read back from its parquet in
    * stored order, columns sorted by name (the driver-compare
    * convention). Returns (rows, sortedSchema, md5hex). */
  private def digest(spark: SparkSession, path: String): (Long, String, String) = {
    val back = spark.read.parquet(path)
    val cols = back.columns.sorted
    val schema = cols.map { c =>
      val f = back.schema(c)
      s"$c:${f.dataType.sql.toLowerCase}"
    }.mkString(",")
    // coalesce(1)-written dumps read as ONE split while under
    // maxPartitionBytes — stored order is the iteration order. Multi-
    // split reads could reorder; record that in the digest name so a
    // reader never trusts an order-ambiguous hash.
    val ordered = back.selectExpr(cols.map(c => s"`$c`"): _*)
    val md = java.security.MessageDigest.getInstance("MD5")
    var rows = 0L
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      var i = 0
      while (i < r.length) {
        md.update(canon(r.get(i)).getBytes("UTF-8"))
        md.update(0x1f.toByte) // unit separator between cells
        i += 1
      }
      md.update('\n'.toByte)
      rows += 1L
    }
    val hex = md.digest().map(b => f"$b%02x").mkString
    val tag = if (ordered.rdd.getNumPartitions == 1) hex else s"multisplit:$hex"
    (rows, schema, tag)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

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
    val digests = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => keep(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val (rows, schema, md5) = digest(spark, s"$outDir/$name")
        digests(name) =
          s"""{"rows":$rows,"schema":${q(schema)},"md5":${q(md5)}}"""
      } catch { case e: Throwable =>
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
          digests(name) = s"""{"error":${q(e.getMessage match {
            case null => e.getClass.getName
            case m => m.take(200)
          })}}"""
        } catch { case _: Throwable => () }
      }
    }
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/digests.json"),
      digests.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
