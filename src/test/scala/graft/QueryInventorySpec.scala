package graft

/** Inventory integrity: the `++` merge of the per-module query maps
  * would silently DROP a query on a key collision — this guard turns
  * that into a test failure. Also pins that every oracle key has a
  * query and naming stays canonical.
  */
class QueryInventorySpec extends SparkSuite {

  test("no key collisions between core and ext query maps") {
    val core = graft.queries.CoreQueries.queries.keySet
    val ext = graft.queries.ExtQueries.queries.keySet
    assert((core & ext).isEmpty, s"colliding keys: ${core & ext}")
    assert(SparkEntry.queries.size === core.size + ext.size)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query ids are canonical qNN_snake_case") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d{2}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-canonical ids: $bad")
  }
}
