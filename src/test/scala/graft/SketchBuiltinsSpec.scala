package graft

import org.apache.spark.sql.functions._

/** Pins the contracts the sketch gates rely on from Spark 4.1's
  * builtin DataSketches suite (theta + KLL): exactness below nominal
  * capacity, partial-merge equivalence, in-plan set algebra, and the
  * ObjectHashAggregate planning path. If an upgrade changes any of
  * these, the gates' tolerance framing needs re-deriving. */
class SketchBuiltinsSpec extends SparkTestBase {

  test("theta below 2^lgK: estimate IS the exact distinct count") {
    import spark.implicits._
    val df = (0L until 9000L).map(i => i % 3000L).toDF("k")
    val est = df.agg(expr("theta_sketch_estimate(theta_sketch_agg(k, 12))").as("e"))
      .collect()(0).getLong(0)
    assert(est == 3000L)
  }

  test("theta repartitioned (forced partial-merge) equals single-partition") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("k")
    def est(parts: Int): Long =
      df.repartition(parts)
        .agg(expr("theta_sketch_estimate(theta_sketch_agg(k, 12))").as("e"))
        .collect()(0).getLong(0)
    assert(est(1) == est(13))
  }

  test("theta_intersection in-plan equals exact overlap") {
    import spark.implicits._
    // group a: 0..1999, group b: 1000..2999 -> overlap 1000..1999 = 1000
    val df = (0L until 2000L).map(("a", _)).toDF("g", "k")
      .union((1000L until 3000L).map(("b", _)).toDF("g", "k"))
    val sk = df.groupBy("g").agg(expr("theta_sketch_agg(k, 12)").as("sk"))
    val a = sk.filter(col("g") === "a").select(col("sk").as("ska"))
    val b = sk.filter(col("g") === "b").select(col("sk").as("skb"))
    val est = a.crossJoin(broadcast(b))
      .select(expr("theta_sketch_estimate(theta_intersection(ska, skb))").as("e"))
      .collect()(0).getLong(0)
    assert(est == 1000L)
  }

  test("kll two-level rollup (sketch -> merge) median is rank-correct") {
    import spark.implicits._
    // 0.0 .. 9999.0 across 4 shards; true median rank of the estimate
    // must hold ACROSS COMPACTION SEEDS (KLL compaction is randomized
    // — k=200 under ±2% flaked in long-run sweeps), so k=400 / ±3%
    // like the gate queries
    val df = (0 until 10000).map(i => (i % 4, i.toDouble)).toDF("s", "v")
    val med = df.groupBy("s").agg(expr("kll_sketch_agg_double(v, 400)").as("sk"))
      .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5d)").as("m"))
      .collect()(0).getDouble(0)
    val rank = df.filter(col("v") <= med).count().toDouble / 10000.0
    assert(math.abs(rank - 0.5) <= 0.03, s"median=$med rank=$rank")
  }

  test("theta aggregate plans through ObjectHashAggregateExec") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 3, i)).toDF("g", "k")
      .groupBy("g").agg(expr("theta_sketch_agg(k, 12)").as("sk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
  }
}
