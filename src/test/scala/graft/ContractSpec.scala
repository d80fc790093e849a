package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the queries/oracle maps are flattened from
  * ~20 modules, and Map semantics make two classes of mistake silent —
  * a name defined twice (later module shadows the earlier operator,
  * which then vanishes from the driver gate with no error) and an
  * oracle whose key matches no query (the query quietly downgrades to
  * a rows-only check). Both must stay empty. */
class ContractSpec extends AnyFunSuite {

  test("no query name is defined by two modules") {
    assert(SparkEntry.duplicateQueryNames.isEmpty,
      s"shadowed queries: ${SparkEntry.duplicateQueryNames}")
  }

  test("every oracle key names an existing query") {
    assert(SparkEntry.orphanOracleNames.isEmpty,
      s"orphan oracles: ${SparkEntry.orphanOracleNames}")
  }

  test("flagship entry and headline queries exist") {
    val qs = SparkEntry.queries.keySet
    for (name <- Seq("q1_agg", "q3_shipping", "q_dedup_exact", "q_ann_brute"))
      assert(qs.contains(name), s"missing headline query $name")
  }
}
