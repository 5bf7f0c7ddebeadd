package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded top-k aggregate vs the window-rank form it replaces. */
class TopKAggSpec extends SparkTestBase {

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy("o_custkey")
    .agg(TopKAgg.topK(col("o_totalprice"), col("o_orderkey"), k).as("top"))
    .select(col("o_custkey"), explode(col("top")).as("t"))
    .select(col("o_custkey"), col("t.payload").as("o_orderkey"),
      col("t.value").as("o_totalprice"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  private val sortKeys = Seq(col("o_custkey"), desc("o_totalprice"), col("o_orderkey"))

  test("matches window row_number form on orders") {
    val o = Tables.t(spark, sf, "orders")
    val a = viaAgg(o, 3).orderBy(sortKeys: _*).collect().toSeq
    val w = viaWindow(o, 3).orderBy(sortKeys: _*).collect().toSeq
    assert(a.nonEmpty && a == w)
  }

  test("value ties resolve to smallest payloads, boundary exact") {
    import spark.implicits._
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 12L), (1L, 4.0, 1L),
      (2L, 7.0, 99L))
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
    val got = viaAgg(df, 2).orderBy(sortKeys: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (2L, 99L, 7.0)))
  }

  test("k larger than any group returns whole groups, merge across partitions exact") {
    val o = Tables.t(spark, sf, "orders").repartition(16) // force partial+merge
    val a = viaAgg(o, 1000000).orderBy(sortKeys: _*).collect().toSeq
    val w = viaWindow(o, 1000000).orderBy(sortKeys: _*).collect().toSeq
    assert(a == w && a.size == o.count())
  }

  test("-0.0 and 0.0 are tie-equal (payload breaks the tie), like SQL ordering") {
    import spark.implicits._
    val df = Seq((1L, -0.0, 1L), (1L, 0.0, 5L))
      .toDF("o_custkey", "o_totalprice", "o_orderkey")
    val got = viaAgg(df, 1).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == Seq(1L), "SQL tie order keeps the smaller payload")
  }

  test("plans through ObjectHashAggregate (map-side partial top-k)") {
    val plan = viaAgg(Tables.t(spark, sf, "orders"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
  }
}
