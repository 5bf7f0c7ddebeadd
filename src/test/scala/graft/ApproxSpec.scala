package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates: bounded relative error vs exact. */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within rsd bound of exact") {
    val li = Tables.t(spark, sf, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      val rel = math.abs(a - e).toDouble / e
      assert(rel <= 0.1, s"flag=${r.getString(0)} err=$rel approx=$a exact=$e")
    }
  }

  test("approx_percentile within tolerance of exact percentile") {
    val li = Tables.t(spark, sf, "lineitem")
    val both = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_med"),
        expr("percentile(l_quantity, 0.5)").as("exact_med"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("approx_p90"),
        expr("percentile(l_quantity, 0.9)").as("exact_p90"))
      .collect()
    both.foreach { r =>
      val medErr = math.abs(r.getDouble(1) - r.getDouble(2)) / math.max(r.getDouble(2), 1.0)
      val p90Err = math.abs(r.getDouble(3) - r.getDouble(4)) / math.max(r.getDouble(4), 1.0)
      assert(medErr <= 0.05 && p90Err <= 0.05,
        s"flag=${r.getString(0)} medErr=$medErr p90Err=$p90Err")
    }
  }

  test("exact co-moment formulas agree with built-in stddev_samp/corr") {
    // agg_moments avoids the built-ins only because their double
    // accumulation is not CROSS-ENGINE reproducible — numerically the
    // closed form over exact integer sums must match them closely
    val li = Tables.t(spark, sf, "lineitem")
    val builtin = li.groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ours = Queries.queries("agg_moments")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(6))).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, (sd, c)) =>
      assert(math.abs(sd - builtin(k)._1) < 1e-9 * math.max(1.0, sd), s"stddev $k")
      assert(math.abs(c - builtin(k)._2) < 1e-9, s"corr $k")
    }
  }
}
