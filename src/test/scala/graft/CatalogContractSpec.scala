package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards for the catalog itself: the things the DuckDB
  * gate can't see because they'd break BEFORE it runs — duplicate query
  * names silently shadowing each other in the `queries` map, oracle
  * entries keyed to nothing, or names the driver's artifacts can't sort
  * sensibly.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("catalog names are unique (no silent map shadowing)") {
    val names = SparkEntry.catalog.map(_._1)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate catalog names: $dupes")
  }

  test("every oracle key has a query and follows the naming pattern") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val pat = "^q\\d+_[a-z0-9_]+$".r
    SparkEntry.catalog.map(_._1).foreach { n =>
      assert(pat.matches(n), s"catalog name breaks the q<N>_<slug> pattern: $n")
    }
  }

  test("every catalog entry is oracle-backed (the correctness gate covers it)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"entries without a DuckDB oracle (gate would only rows-check): $unoracled")
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
