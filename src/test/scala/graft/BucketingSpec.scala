package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Bucketing: pre-partitioned tables join WITHOUT a shuffle — the
  * co-location strategy for repeated large-large joins at 100 TB.
  * (Repartitioning both sides once and bucketing by the join key
  * amortizes the shuffle across every later join on that key.) */
class BucketingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bucketed tables join with zero Exchange in the plan") {
    val wh = tmpDir("warehouse")
    val s2 = spark
    s2.sql(s"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '$wh/buckdb'")
    Tables.t(s2, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("buckdb.li_b")
    Tables.t(s2, sf, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("buckdb.ord_b")

    val joined = s2.table("buckdb.li_b").join(s2.table("buckdb.ord_b"), "l_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(1)).sum == 6000L)

    // the join itself must not shuffle either side
    val exec = joined.queryExecution.executedPlan
    val exchangesBeforeAgg = collectWithSubqueries(exec) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // one exchange is legitimate: the groupBy after the join.
    assert(exchangesBeforeAgg.size <= 1,
      s"expected at most the aggregation exchange, got ${exchangesBeforeAgg.size}:\n$exec")
  }
}
