package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Bucketing: pre-partitioned tables join WITHOUT a shuffle — the
  * co-location strategy for repeated large-large joins at 100 TB.
  * (Repartitioning both sides once and bucketing by the join key
  * amortizes the shuffle across every later join on that key.) */
class BucketingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  test("bm25AppendBatch: repeated daily appends rank identically to a full rebuild") {
    // the REPEATABLE maintenance claim: corpus build + TWO separate
    // appends (two "days") must serve the same ranking as computing
    // postings + stats over everything at once — no posting rewrite,
    // stats upserted twice, df derived live
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark merge window spark runs the daily merge"),
      (2L, "window functions rank rows inside spark plans"),
      (3L, "totally unrelated words live here quietly")).toDF("doc_id", "text")
    val day1 = Seq(
      (10L, "the merge window opened and spark processed it"),
      (11L, "nothing relevant again in this one")).toDF("doc_id", "text")
    val day2 = Seq(
      (20L, "spark spark spark merge"),
      (21L, "window dressing only")).toDF("doc_id", "text")
    val wh = tmpDir("graft_bm25i_unit_")
    val db = s"bm25unit${java.lang.Long.toHexString(System.nanoTime())}"
    spark.sql(s"CREATE DATABASE $db LOCATION '$wh/$db'")
    TextQueries.bm25RawPostings(corpus)
      .write.bucketBy(64, "token").sortBy("token").saveAsTable(s"$db.postings")
    TextQueries.bm25StatsOf(corpus).write.saveAsTable(s"$db.stats")
    TextQueries.bm25AppendBatch(spark, db, day1)
    TextQueries.bm25AppendBatch(spark, db, day2)
    val terms = Seq("spark", "merge", "window")
    val served = TextQueries.bm25ScoreTerms(
        spark.table(s"$db.postings"), spark.table(s"$db.stats"), terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val all = corpus.unionByName(day1).unionByName(day2)
    val full = TextQueries.bm25ScoreTerms(
        TextQueries.bm25RawPostings(all), TextQueries.bm25StatsOf(all), terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served === full)
    assert(served.nonEmpty && served.map(_._1).contains(20L)) // day-2 doc ranks
    // the maintained stats row carries BOTH appends
    val st = spark.table(s"$db.stats").collect()(0)
    assert(st.getLong(0) === 7L, s"d=${st.getLong(0)}")
  }

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
