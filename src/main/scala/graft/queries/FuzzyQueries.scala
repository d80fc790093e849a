package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Fuzzy (edit-distance) join queries over the part-name vocabulary.
  * The oracle is the ground-truth ALL-PAIRS Levenshtein join, so a
  * hash match proves the deletion-neighborhood blocking lost nothing
  * (recall 1.0) and the residual filter added nothing (precision 1.0).
  */
object FuzzyQueries {
  import Q._

  private def namePairs(s: org.apache.spark.sql.SparkSession, dir: String, k: Int) = {
    val names = t(s, dir, "part").select(col("p_name")).distinct()
    FuzzyJoin.editDistancePairs(names, "p_name", "p_name", k)
      .select(col("s_a").as("name_a"), col("s_b").as("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }

  private def oracleSql(k: Int): String =
    s"""WITH n AS (SELECT DISTINCT p_name FROM part)
       |SELECT a.p_name AS name_a, b.p_name AS name_b,
       |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
       |FROM n a JOIN n b ON a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) <= $k
       |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q_fuzzy_pairs" -> ((s, dir) => namePairs(s, dir, 1)),
    "q_fuzzy_pairs2" -> ((s, dir) => namePairs(s, dir, 2))
  )

  val oracle: Map[String, String] = Map(
    "q_fuzzy_pairs" -> oracleSql(1),
    "q_fuzzy_pairs2" -> oracleSql(2)
  )
}
