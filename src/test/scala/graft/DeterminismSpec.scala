package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract determinism: the driver's correctness hash is
  * ROW-ORDER-sensitive, so every gated query must produce a fully
  * determined row sequence — identical under any partitioning. Round 8
  * shipped 8 red rows that were multiset-identical to the oracle but
  * tie-ordered by luck (`(l_orderkey, l_linenumber)` is not unique in
  * the testdata; several wide matrices had no ORDER BY at all).
  *
  * This spec re-runs EVERY SparkEntry query at sf0.001 in two child
  * sessions whose shuffle partitioning and scan split size differ
  * (3×1MB vs 13×128MB) and asserts the canonicalized row sequences are
  * identical. Partitioning is the driver of tie-order luck: different
  * partition counts change merge order in sorts, aggregates and
  * unions, so a query that passes here has a totally determined output
  * order (or a harmlessly-tied one — rows identical in every projected
  * column).
  */
class DeterminismSpec extends SparkSpec {

  /** Canonical row rendering: Row.toString is identity-hash-based for
    * binary columns, so render bytes and nested values explicitly. */
  private def canon(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => b.mkString("b[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "→" + canon(x) }
        .sorted.mkString("{", ",", "}")
    case x => String.valueOf(x)
  }

  private def child(parts: Int, splitBytes: Long): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts)
    s.conf.set("spark.sql.files.maxPartitionBytes", splitBytes)
    s
  }

  test("every driver-gated query's row sequence survives a partitioning change") {
    val a = child(3, 1L << 20)
    val b = child(13, 128L << 20)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val ra = fn(a, sfDir).collect().map(r => canon(r))
          val rb = fn(b, sfDir).collect().map(r => canon(r))
          if (ra.sameElements(rb)) None
          else {
            val i = ra.zip(rb).indexWhere { case (x, y) => x != y }
            val at = if (i >= 0) i else math.min(ra.length, rb.length)
            Some(s"$name: rows ${ra.length} vs ${rb.length}, first diff at row $at:" +
              s"\n  A=${ra.lift(at).getOrElse("<none>")}\n  B=${rb.lift(at).getOrElse("<none>")}")
          }
        } catch {
          case e: Throwable => Some(s"$name: threw ${e.getMessage}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} order-indeterminate queries:\n${failures.mkString("\n")}")
  }
}
