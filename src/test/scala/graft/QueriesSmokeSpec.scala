package graft

/** Every registered query must run and return rows at sf0.001 —
  * the driver's weaker check for oracle-less entries, applied to all. */
class QueriesSmokeSpec extends SparkTestBase {
  Queries.registry.foreach { q =>
    test(s"${q.name} returns rows") {
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = Queries.queries.keySet
    assert(Queries.oracleSql.keySet.subsetOf(qs))
  }
}
