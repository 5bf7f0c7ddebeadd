package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Salted operators must be result-identical to their direct forms. */
class SkewSpec extends SparkTestBase {

  test("saltedAggregate == direct groupBy for sum/count/min/max") {
    val li = Tables.t(spark, sf, "lineitem")
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"),
      Map(
        "sum_qty" -> (col("l_quantity").cast(DecimalType(12, 2)), Skew.SumAgg),
        "n" -> (lit(1), Skew.CountAgg),
        "min_q" -> (col("l_quantity"), Skew.MinAgg),
        "max_q" -> (col("l_quantity"), Skew.MaxAgg)),
      buckets = 7)
      .orderBy("l_returnflag").collect()
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("sum_qty"),
        count(lit(1)).as("n"), min("l_quantity").as("min_q"), max("l_quantity").as("max_q"))
      .orderBy("l_returnflag").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("saltedJoin == direct inner join") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), buckets = 5)
    val direct = li.join(o, Seq("l_orderkey"))
    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the executed plan)") {
    // the runtime complement of manual salting: AQE detects the
    // oversized post-shuffle partition and splits it into parallel
    // subtasks — no query rewrite needed. Thresholds forced low so
    // the local-scale fixture trips the same path a 100 TB hot key
    // would; broadcast disabled so the join actually shuffles.
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(0, 200000)
        .selectExpr("if(id < 190000, 0L, id) AS k", "id AS v")
      val small = spark.range(0, 64).selectExpr("id AS k", "id AS w")
      val j = big.join(small, "k")
      // materialize THIS dataframe (count() would plan its own
      // execution and leave j's plan unexecuted/un-adapted)
      assert(j.collect().length == 190000) // only key 0 matches the small side
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join, plan:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
