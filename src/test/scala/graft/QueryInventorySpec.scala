package graft

/** Inventory integrity: the `++` merge of the per-module query maps
  * would silently DROP a query on a key collision — this guard turns
  * that into a test failure. Also pins that every oracle key has a
  * query and naming stays canonical.
  */
class QueryInventorySpec extends SparkSuite {

  test("no key collisions between per-module query maps") {
    val core = graft.queries.CoreQueries.queries.keySet
    val ext = graft.queries.ExtQueries.queries.keySet
    val r3 = graft.queries.R3Queries.queries.keySet
    assert((core & ext).isEmpty, s"colliding keys: ${core & ext}")
    assert((core & r3).isEmpty, s"colliding keys: ${core & r3}")
    assert((ext & r3).isEmpty, s"colliding keys: ${ext & r3}")
    assert(SparkEntry.queries.size === core.size + ext.size + r3.size)
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
