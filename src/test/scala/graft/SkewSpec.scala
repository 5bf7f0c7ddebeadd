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
}
