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
}
