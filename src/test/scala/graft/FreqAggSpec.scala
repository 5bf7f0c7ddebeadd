package graft

import graft.functions.FreqAgg
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra-Gries sketch + exact heavy-hitter composition. */
class FreqAggSpec extends SparkTestBase {
  import spark.implicits._

  private def toks = Tables.t(spark, sf, "documents")
    .select(explode(split(col("text"), " ")).as("token"))

  test("sketch candidate completeness: every key above n/(k+1) survives") {
    val k = 64
    val n = toks.count()
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mustHave = exact.filter(_._2 > n / (k + 1)).keySet
    assert(mustHave.nonEmpty, "fixture must have heavy tokens for this to test anything")
    val cands = toks.agg(FreqAgg.freqSketch(col("token"), k).as("c"))
      .select(explode(col("c")).as("e")).select($"e.token", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands.size <= k, s"state bound violated: ${cands.size} > $k")
    assert(mustHave.subsetOf(cands.keySet),
      s"missing guaranteed candidates: ${(mustHave -- cands.keySet).take(5)}")
    // estimates never exceed truth and undercount by at most n/(k+1)
    cands.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
      assert(exact(t) - est <= n / (k + 1), s"$t undercount too deep")
    }
  }

  test("exactHeavyHitters equals the exhaustive groupBy filter") {
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * 50 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = HeavyHitters.exactHeavyHitters(toks, col("token"), t = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    assert(want.nonEmpty)
  }

  test("serialize round-trips keys past the 64 KiB modified-UTF8 limit") {
    // writeUTF would throw UTFDataFormatException here; the sketch is
    // SQL-registered over arbitrary strings so long keys must survive
    // the partial-serialization boundary (forced by 8 partitions)
    val big = "x" * 100000
    val rows = Seq.fill(40)(big) ++ (1 to 30).map(i => s"small$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("token")
    val cands = df.agg(FreqAgg.freqSketch(col("token"), 4).as("c"))
      .select(explode(col("c")).as("e")).select($"e.token", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands.contains(big), "the heavy long key must survive serde + merges")
    assert(cands(big) <= 40L)
  }

  test("exactHeavyHitters excludes nulls from candidates AND denominator") {
    // 60 nulls + 30 "hot" + 30 distinct singletons; t=3 → threshold is
    // count > n/3 over NON-NULL rows (n=60, bar 20) so "hot" qualifies.
    // Counting nulls into n (bar 40) would silently drop it.
    val rows = Seq.fill(60)(null.asInstanceOf[String]) ++
      Seq.fill(30)("hot") ++ (1 to 30).map(i => s"one$i")
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 8).toDF("token")
    val got = HeavyHitters.exactHeavyHitters(df, col("token"), t = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 30L), s"got $got")
  }

  test("merge shrink keeps the bound under forced multi-partition partials") {
    val k = 8
    val skewed = (1 to 2000).map(i => if (i % 3 == 0) "hot" else s"cold$i")
    val df = spark.sparkContext.parallelize(skewed, 16).toDF("token")
    val cands = df.agg(FreqAgg.freqSketch(col("token"), k).as("c"))
      .select(explode(col("c")).as("e")).select($"e.token", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cands.size <= k)
    assert(cands.contains("hot"), "the one genuinely frequent key must survive merges")
    assert(cands("hot") <= 666L)
  }
}
