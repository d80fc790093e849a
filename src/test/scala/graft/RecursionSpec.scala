package graft

import org.apache.spark.sql.functions._
import graft.operators.Recursion

/** Fixpoint recursion semantics the oracle hash-match can't isolate:
  * UNION ALL multiplicity, the cycle guard, UNION-distinct termination
  * on cyclic graphs, and a seeded random-graph differential against a
  * driver-side BFS model. */
class RecursionSpec extends SparkSpec {
  import spark.implicits._

  test("iterate: UNION ALL closure over a hand-built tree, depth = BFS level") {
    // edges: 1->{10,11}, 10->{100}, 11->{110,111}
    val edges = Seq((10L, 1L), (11L, 1L), (100L, 10L), (110L, 11L), (111L, 11L))
      .toDF("child", "parent")
    val base = Seq((1L, 0)).toDF("node", "depth")
    val got = Recursion.iterate(base, fr =>
        edges.join(fr, edges("parent") === fr("node"))
          .select(col("child").as("node"), (col("depth") + 1).as("depth")))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 10L -> 1, 11L -> 1, 100L -> 2, 110L -> 2, 111L -> 2))
  }

  test("iterate: UNION ALL keeps one row per derivation path (diamond => 2 rows)") {
    // diamond: 1->2, 1->3, 2->4, 3->4 — node 4 is derived twice
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 2L), (4L, 3L)).toDF("child", "parent")
    val base = Seq(1L).toDF("node")
    val got = Recursion.iterate(base, fr =>
        edges.join(fr, edges("parent") === fr("node"))
          .select(col("child").as("node")))
      .groupBy("node").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("iterate: cycle guard aborts instead of looping forever") {
    val edges = Seq((2L, 1L), (1L, 2L)).toDF("child", "parent")
    val base = Seq(1L).toDF("node")
    val ex = intercept[IllegalStateException] {
      Recursion.iterate(base, fr =>
        edges.join(fr, edges("parent") === fr("node"))
          .select(col("child").as("node")), maxIter = 5).count()
    }
    assert(ex.getMessage.contains("5"))
  }

  test("iterateDistinct: terminates on a cycle and returns the reachable set") {
    // 1 -> 2 -> 3 -> 1 (cycle), 3 -> 4, 5 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val base = Seq(1L).toDF("node")
    val got = Recursion.iterateDistinct(base, fr =>
        edges.join(fr, edges("src") === fr("node")).select(col("dst").as("node")))
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("iterateDistinct: seeded random digraph == driver-side BFS closure") {
    val rnd = new scala.util.Random(20260813)
    val n = 40
    val edgeList = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    // driver-side model: plain BFS over an adjacency map
    val adj = edgeList.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var seen = Set(0L); var frontier = Set(0L)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(x => adj.getOrElse(x, Nil)).diff(seen)
      seen ++= next; frontier = next
    }
    val edges = edgeList.toDF("src", "dst")
    val got = Recursion.iterateDistinct(Seq(0L).toDF("node"), fr =>
        edges.join(fr, edges("src") === fr("node")).select(col("dst").as("node")))
      .as[Long].collect().toSet
    assert(got == seen)
  }

  test("iterate: empty base returns empty with the base schema") {
    val edges = Seq((2L, 1L)).toDF("child", "parent")
    val base = Seq.empty[Long].toDF("node")
    val got = Recursion.iterate(base, fr =>
      edges.join(fr, edges("parent") === fr("node"))
        .select(col("child").as("node")))
    assert(got.columns.toSeq == Seq("node") && got.isEmpty)
  }
}
