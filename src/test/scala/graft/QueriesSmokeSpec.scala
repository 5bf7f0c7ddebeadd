package graft

/** Every registered query must run and return rows at sf0.001 —
  * the driver's weaker check for oracle-less entries, applied to all. */
class QueriesSmokeSpec extends SparkTestBase {
  Queries.registry.foreach { q =>
    test(s"${q.name} returns rows") {
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
      // registry-wide plan hygiene: an unpartitioned two-big-sides
      // cartesian product must never appear (broadcast nested-loop
      // against a bounded side is fine and shows up differently)
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        s"${q.name} executes a CartesianProduct")
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
