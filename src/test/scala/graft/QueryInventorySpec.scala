package graft

/** Inventory integrity: the `++` merge of the per-module query maps
  * would silently DROP a query on a key collision — this guard turns
  * that into a test failure. Also pins that every oracle key has a
  * query and naming stays canonical.
  */
class QueryInventorySpec extends SparkSuite {

  test("no key collisions between per-module query maps") {
    val modules = Seq(
      "core" -> graft.queries.CoreQueries.queries.keySet,
      "ext" -> graft.queries.ExtQueries.queries.keySet,
      "r3" -> graft.queries.R3Queries.queries.keySet,
      "r4" -> graft.queries.R4Queries.queries.keySet,
      "r5" -> graft.queries.R5Queries.queries.keySet,
      "r6" -> graft.queries.R6Queries.queries.keySet,
      "r7" -> graft.queries.R7Queries.queries.keySet,
      "r8" -> graft.queries.R8Queries.queries.keySet,
      "r9" -> graft.queries.R9Queries.queries.keySet,
      "r10" -> graft.queries.R10Queries.queries.keySet,
      "r11" -> graft.queries.R11Queries.queries.keySet,
      "r12" -> graft.queries.R12Queries.queries.keySet,
      "r13" -> graft.queries.R13Queries.queries.keySet,
      "r14" -> graft.queries.R14Queries.queries.keySet)
    for {
      (an, a) <- modules
      (bn, b) <- modules if an < bn
    } assert((a & b).isEmpty, s"colliding keys between $an and $bn: ${a & b}")
    assert(SparkEntry.queries.size === modules.map(_._2.size).sum)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query ids are canonical qNN_snake_case") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d{2,}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-canonical ids: $bad")
  }
}
