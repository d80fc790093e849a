package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ k) similarity self-join without the
  * all-pairs plan — the entity-resolution / typo-clustering step of a
  * curation pipeline.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries"): every string emits
  * its ≤k-character-deletion variants; two strings within edit
  * distance k ALWAYS share a variant (from any ≤k-op edit script,
  * deleting the script's touched positions from each side yields a
  * common subsequence reachable by ≤k deletions from both), so joining
  * on variant keys has recall 1.0 by construction and the exact
  * Levenshtein check runs only on candidates. The reference engine has
  * no fuzzy join at all — its LIKE/REGEXP scans (SURVEY §2.2) are the
  * closest surface — so this is pipeline-extension territory.
  *
  * Scale shape: a string of length n emits O(n^k) keys (n+1 for k=1)
  * — keys are SHORTER than the string, shuffled as narrow (key, id)
  * rows. Candidate volume is Σ_key df(key)², the same df² bound as the
  * Jaccard prefix filter (`llm/Dedup.jaccardDupPairs`); for
  * identifier-like columns key groups are tiny. Candidates are
  * `distinct`ed BEFORE the verify so each pair runs one banded
  * Levenshtein (threshold form: O(k·n) per pair, not O(n²)). Keep k
  * small (1–2): that is both the algorithm's design point and the
  * useful semantic range for dedup.
  */
object FuzzyJoin {

  /** All variants of `s` reachable by 0..k single-character deletions
    * (includes `s` itself), deduplicated. Pure codegen-able column
    * expression — no UDF. */
  def deletionNeighborhood(s: Column, k: Int): Column = {
    // one deletion applied to every element of an array of strings
    def delOnce(arr: Column): Column = array_distinct(flatten(transform(arr, v =>
      when(length(v) > lit(0),
        transform(sequence(lit(0), length(v) - 1), i =>
          concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v) - i - 1))))
        .otherwise(array().cast("array<string>")))))
    var acc = array(s)
    var frontier = array(s)
    for (_ <- 1 to k) {
      frontier = delOnce(frontier)
      acc = array_union(acc, frontier)
    }
    acc
  }

  /** Self-join: unordered pairs of rows with levenshtein(str) ≤ k.
    * Output: (id_a, s_a, id_b, s_b, dist) with id_a < id_b.
    *
    * @param df  one row per entity; `id` must be unique and orderable
    * @param id  id column name
    * @param str string column name (null strings never match)
    * @param k   max edit distance (1 or 2 in practice)
    */
  def editDistancePairs(df: DataFrame, id: String, str: String, k: Int): DataFrame = {
    val keyed = df.select(col(id).as("_id"), col(str).as("_s"))
      .filter(col(str).isNotNull)
      .withColumn("_key", explode(deletionNeighborhood(col("_s"), k)))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a._key") === col("b._key") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("a._s").as("s_a"),
        col("b._id").as("id_b"), col("b._s").as("s_b"))
      .distinct() // one verify per candidate pair, not per shared key
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), k))
      .filter(col("dist") >= 0) // threshold form returns -1 when > k
  }
}
