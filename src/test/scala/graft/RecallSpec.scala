package graft

/**
 * Pins the measured recall/error gates (RecallQueries) at sf0.001:
 * each gate's REQUIRE floor must hold AND the emitted measurement must
 * be sane (0 < recall <= 1000). The gates themselves REQUIRE their
 * floors in-plan — these tests run them end-to-end so a kernel
 * regression that drops a family toward chance fails in CI, not in
 * the driver's Verify sweep.
 */
class RecallSpec extends SparkTestBase {

  private def runGate(name: String): org.apache.spark.sql.DataFrame =
    Queries.queries(name)(spark, sf)

  test("sim recall gates emit one sane measured row each") {
    for (name <- Seq("sim_ann_recall", "sim_ivf_recall",
                     "sim_pq_recall", "sim_ivfpq_recall")) {
      val r = runGate(name).collect()
      assert(r.length === 1, s"$name rows")
      val recall = r(0).getAs[Long]("recall_permille")
      assert(recall > 0L && recall <= 1000L, s"$name recall=$recall")
      assert(r(0).getAs[Long]("n_probes") === 20L)
      assert(r(0).getAs[Long]("k") === 10L)
    }
  }

  test("embedding near-dup recall gate measures organic pairs") {
    val r = runGate("embed_neardup_recall").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_true_pairs") > 100L, "jitter fixture too sparse")
    val recall = r(0).getAs[Long]("recall_permille")
    assert(recall >= 700L && recall <= 1000L, s"recall=$recall")
  }

  test("approximate-aggregate error gates stay under their floors") {
    val d = runGate("agg_approx_distinct_error").collect()
    assert(d.nonEmpty)
    assert(d.forall(_.getAs[Long]("err_permille") <= 100L))
    val p = runGate("agg_approx_percentile_error").collect()
    assert(p.nonEmpty)
    assert(p.forall(_.getAs[Long]("err_permille") <= 50L))
  }
}
