package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** FastSS fuzzy join vs brute-force Levenshtein ground truth:
  * recall/precision 1.0 over a vocabulary exercising insert, delete,
  * substitute, transpose (=2 ops), unicode, and the empty string. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "kitten", "sitten", "sittin", "sitting", // classic chain
    "abc", "abd", "abcd", "ab", "ba",        // subst / ins / del / transpose
    "", "a",                                  // empty-string edge
    "héllo", "hello", "hèllo",                // multi-byte chars
    "same", "same2"
  ).zipWithIndex.map { case (s, i) => (i.toLong, s) }

  private def brute(k: Int): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- vocab; (ib, sb) <- vocab
      if ia < ib && lev(sa, sb) <= k
    } yield (ia, ib)).toSet
  }

  for (k <- Seq(1, 2)) test(s"editDistancePairs k=$k equals brute force") {
    val df = vocab.toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", k)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(k))
  }

  test("reported dist is the true levenshtein distance") {
    val df = vocab.toDF("id", "s")
    val bad = FuzzyJoin.editDistancePairs(df, "id", "s", 2)
      .filter(levenshtein(col("s_a"), col("s_b")) =!= col("dist"))
    assert(bad.isEmpty)
  }

  test("deletion neighborhood sizes: n+1 keys at k=1, includes self") {
    val r = Seq("abcd").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 1).as("ks"))
      .head.getSeq[String](0)
    assert(r.contains("abcd") && r.toSet == Set("abcd", "bcd", "acd", "abd", "abc"))
  }
}
