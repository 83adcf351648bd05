package graft

class EntrySpec extends SparkSpec {
  test("driver contract: entry() returns rows and every query has a runnable plan") {
    // the driver's smoke check — rows > 0 on the flagship query at sf0.001
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key has a query (a dangling oracle would silently skip
    // the driver's compare for that name)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
