package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmented (two-phase) rank must be cell-identical to the plain
  * single-window form for all six ranking functions. */
class RankingSpec extends SparkTestBase {

  private def plainRanks(df: org.apache.spark.sql.DataFrame, p: String,
                         ks: Seq[String], n: Int) = {
    val w = Window.partitionBy(p).orderBy(ks.map(col): _*)
    df.withColumn("rank", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .withColumn("row_number", row_number().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .withColumn("ntile", ntile(n).over(w).cast("long"))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, p: String,
                         ks: Seq[String], buckets: Int, n: Int): Unit = {
    val sortKeys = (p +: ks).map(col)
    val exact = plainRanks(df, p, ks, n).orderBy(sortKeys: _*).collect().toSeq
    val seg = Ranking.segmentedRanks(df, p, ks, buckets, Some(n))
      .select(exact.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy(sortKeys: _*).collect().toSeq
    assert(seg == exact)
  }

  private lazy val li = Tables.t(spark, sf, "lineitem")
    .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")

  test("matches plain window on lineitem (unique composite key)") {
    assertSame(li, "l_returnflag",
      Seq("l_quantity", "l_orderkey", "l_linenumber"), buckets = 8, n = 4)
  }

  test("tie-heavy leading key: equal keys never straddle buckets") {
    // order by l_quantity alone -> massive ties; rank/dense_rank/
    // percent_rank/cume_dist are tie-stable, so they must still match
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val exact = li
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .collect().toSeq
    val seg = Ranking.segmentedRanks(li, "l_returnflag", Seq("l_quantity"), 8)
      .select(exact.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(seg == exact)
  }

  test("degenerate cases: one bucket, more buckets than rows, tiles > rows") {
    import spark.implicits._
    val tiny = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("p", "k")
    assertSame(tiny, "p", Seq("k"), buckets = 1, n = 2)
    assertSame(tiny, "p", Seq("k"), buckets = 64, n = 7)
  }

  test("NULL partition values and NULL leading keys match the plain window") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(3), 1L), (Some("a"), None, 2L), (Some("a"), Some(1), 3L),
      (None, Some(5), 4L), (None, None, 5L), (None, Some(2), 6L))
      .toDF("p", "k", "id")
      .select(col("p"), col("k").cast("double").as("k"), col("id"))
    val w = Window.partitionBy("p").orderBy("k", "id")
    val exact = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("dense_rank", dense_rank().over(w).cast("long"))
      .withColumn("row_number", row_number().over(w).cast("long"))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .orderBy("id").collect().toSeq
    val seg = Ranking.segmentedRanks(df, "p", Seq("k", "id"), buckets = 4)
      .select(exact.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("id").collect().toSeq
    assert(seg == exact, "rows with NULL keys must neither drop nor re-rank")
  }

  test("non-numeric leading key is rejected with a clear contract error") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang", "source")
    val e = intercept[IllegalArgumentException](
      Ranking.segmentedRanks(docs, "source", Seq("lang", "doc_id")))
    assert(e.getMessage.contains("numeric or timestamp"))
  }

  test("exactQuantile matches in-memory sorted ground truth (incl. recursion path)") {
    val vals = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    def truth(q: Double): Double = {
      val pos = (vals.length - 1) * q
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      if (frac == 0.0) vals(lo) else vals(lo) + frac * (vals(lo + 1) - vals(lo))
    }
    val li = Tables.t(spark, sf, "lineitem")
    Seq(0.0, 0.25, 0.5, 0.9, 1.0).foreach { q =>
      // probeLimit 64 forces several recursion levels on 6k rows
      val got = Ranking.exactQuantile(li, "l_extendedprice", q, probeLimit = 64).get
      assert(got == truth(q), s"q=$q got=$got want=${truth(q)}")
    }
  }

  test("exactQuantiles batch form: one pipeline, same answers as singles") {
    val li = Tables.t(spark, sf, "lineitem")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    // small probeLimit exercises the shared-histogram recursion with
    // several ranks landing in distinct buckets
    val batch = Ranking.exactQuantiles(li, "l_extendedprice", qs, probeLimit = 64)
    val singles = qs.map(q => Ranking.exactQuantile(li, "l_extendedprice", q, probeLimit = 64))
    assert(batch == singles)
    assert(Ranking.exactQuantiles(li, "l_extendedprice", Seq.empty).isEmpty)
  }

  test("exactQuantile degenerate inputs: constant column, empty input") {
    import spark.implicits._
    val const = Seq.fill(200)(7.5).toDF("x")
    assert(Ranking.exactQuantile(const, "x", 0.5, probeLimit = 16).contains(7.5))
    val empty = Seq.empty[Double].toDF("x")
    assert(Ranking.exactQuantile(empty, "x", 0.5).isEmpty)
  }

  test("exactQuantile near-constant column: collapsed sample boundaries stay bounded") {
    import spark.implicits._
    // one 7.5 + 500 copies of 7.6: the 5% boundary sample almost surely
    // sees only 7.6, so every sampled boundary >= max → single bucket →
    // the fallback must re-bucket on exact min/max (never collect the
    // data to the driver) and still be exact.
    val df = (7.5 +: Seq.fill(500)(7.6)).toDF("x")
    assert(Ranking.exactQuantile(df, "x", 0.0, probeLimit = 16).contains(7.5))
    assert(Ranking.exactQuantile(df, "x", 0.5, probeLimit = 16).contains(7.6))
    // adjacent-doubles variant: no representable boundary fits strictly
    // between lo and hi → the two-value count path resolves it
    val hi = java.lang.Math.nextUp(7.5)
    val two = (7.5 +: Seq.fill(500)(hi)).toDF("x")
    assert(Ranking.exactQuantile(two, "x", 0.0, probeLimit = 16).contains(7.5))
    assert(Ranking.exactQuantile(two, "x", 1.0, probeLimit = 16).contains(hi))
  }

  test("exactQuantile with non-finite values: ±Inf and NaN peel exactly") {
    import spark.implicits._
    // Inf defeats an equi-width grid (step overflows); the fallback
    // must peel the extreme value classes, not misattribute interior
    // ranks to them. Spark orders NaN greatest.
    val inf = (Seq(1.0, 2.0) ++ Seq.fill(500)(Double.PositiveInfinity)).toDF("x")
    assert(Ranking.exactQuantile(inf, "x", 0.0, probeLimit = 16).contains(1.0))
    assert(Ranking.exactQuantile(inf, "x", 1.0, probeLimit = 16)
      .contains(Double.PositiveInfinity))
    val mixed = (Seq(Double.NegativeInfinity) ++ (1 to 400).map(_.toDouble) ++
      Seq(Double.PositiveInfinity, Double.NaN)).toDF("x")
    assert(Ranking.exactQuantile(mixed, "x", 0.0, probeLimit = 16)
      .contains(Double.NegativeInfinity))
    // rank 202 of 403 = value 201 (interior stays exact despite the peels)
    val mid = Ranking.exactQuantiles(mixed, "x", Seq(201.0 / 402.0), buckets = 4,
      probeLimit = 16).head.get
    assert(mid == 201.0, s"got $mid")
    val allNan = Seq.fill(100)(Double.NaN).toDF("x")
    assert(Ranking.exactQuantile(allNan, "x", 0.5, probeLimit = 16).exists(_.isNaN))
  }

  test("groupedCountingQuantile matches built-in percentile() per group") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
    Seq(0.0, 0.25, 0.5, 0.9, 1.0).foreach { q =>
      val want = li.groupBy("l_returnflag")
        .agg(expr(s"percentile(l_quantity, $q)").as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = Ranking.groupedCountingQuantile(li, "l_returnflag", "l_quantity", q)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"q=$q got=$got want=$want")
    }
    // interpolation between distinct values (even count, frac = 0.5)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0),
      ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val m = Ranking.groupedCountingQuantile(df, "g", "v", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("a" -> 3.0, "b" -> 3.0))
    // nulls excluded per SQL convention; an ALL-null group keeps its
    // row with a null quantile (percentile() parity — a group must
    // never vanish from the output)
    val withNull = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", None)).toDF("g", "v")
    val mn = Ranking.groupedCountingQuantile(withNull, "g", "v", 0.5)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(mn == Map("a" -> Some(2.0), "b" -> None))
  }

  test("ntile exact-size contract on a known distribution") {
    import spark.implicits._
    // 10 rows, 4 tiles -> sizes 3,3,2,2
    val df = (1 to 10).map(i => ("x", i)).toDF("p", "k")
    val sizes = Ranking.segmentedRanks(df, "p", Seq("k"), 4, Some(4))
      .groupBy("ntile").count().orderBy("ntile")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sizes == Seq((1L, 3L), (2L, 3L), (3L, 2L), (4L, 2L)))
  }

  test("groupedCumWeights matches per-value window cumulative (weighted)") {
    val li2 = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("wt"))
    // reference: cumulative weight per distinct (flag, price) from a
    // value-level window — tiny at sf0.001, the semantics oracle
    val ref = li2.groupBy("l_returnflag", "l_extendedprice")
      .agg(sum("wt").as("w"))
      .withColumn("cum_w", sum("w").over(
        Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_w", sum("w").over(Window.partitionBy("l_returnflag")))
      .select("l_returnflag", "l_extendedprice", "cum_w", "tot_w")
      .orderBy("l_returnflag", "l_extendedprice").collect().toSeq
    // narrow bands force many band partitions; wide bands force one —
    // results must be identical either way (bands size, never decide)
    for (bw <- Seq(100.0, 1e9)) {
      val got = Ranking.groupedCumWeights(li2, Seq("l_returnflag"),
          "l_extendedprice", col("wt"), bandWidth = bw)
        .orderBy("l_returnflag", "l_extendedprice").collect().toSeq
      assert(got == ref, s"bandWidth=$bw")
    }
  }

  test("groupedCumWeights: null values rank first, null groups kept, multi-group key") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(3L), 1L), (Some("a"), None, 2L), (Some("a"), Some(1L), 4L),
      (None, Some(5L), 3L), (None, Some(5L), 1L), (Some("b"), None, 7L))
      .toDF("g", "v", "w").withColumn("g2", lit("k"))
    val got = Ranking.groupedCumWeights(df, Seq("g", "g2"), "v", col("w"),
        bandWidth = 2.0)
      .select("g", "v", "cum_w", "tot_w")
      .collect().map(r => (Option(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2), r.getLong(3))).toSet
    // group a: null(w=2) first -> cum 2; v=1 cum 6; v=3 cum 7; tot 7
    // group null: v=5 (w=4) -> cum 4, tot 4; group b: null-only kept
    assert(got == Set(
      (Some("a"), None, 2L, 7L), (Some("a"), Some(1L), 6L, 7L),
      (Some("a"), Some(3L), 7L, 7L),
      (None, Some(5L), 4L, 4L), (Some("b"), None, 7L, 7L)))
  }
}
