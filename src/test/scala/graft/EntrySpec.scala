package graft

/** Driver-contract guards: the round harness smoke-checks entry() rows > 0,
  * runs every queries entry, and feeds oracleSql to DuckDB — catch contract
  * drift locally. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry; names are unique") {
    val qNames = Queries.all.map(_.name)
    assert(qNames.distinct.size == qNames.size, "duplicate query names")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle SQL contains no unescapable control characters") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t' && c != '\r'),
        s"$name contains odd control chars")
    }
  }
}
