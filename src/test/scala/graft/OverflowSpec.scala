package graft

import org.apache.spark.sql.functions._

/**
 * Pins the DECIMAL(38,0) graduation of the exact-integer-rational
 * sites (VERDICT r15 "What's wrong #1"): on synthetic frames placed
 * INSIDE the BIGINT wrap regime (counts past ~3e9 / products past
 * 2^63), the DECIMAL form returns the mathematically-correct value
 * while the bare-BIGINT form it replaced wraps silently under
 * non-ANSI Spark. Sites graduated this round: orders_item_cosine_topk
 * co²·10³ div (ni·nj); text_gini_lengths gnum / n_docs·total_chars;
 * text_diversity_simpson Σc² / n_tokens²; orders_dow_seasonality
 * (7n−tot)²; graph_clustering_coeff d·(d−1); graph_rich_club
 * n_nodes·(n_nodes−1); privacy_t_closeness n·N cross-products;
 * diag_band_buckets c·(c−1); the PSI family's count products; the
 * events_correlation/autocorr/trend/zscore/assortativity moment sums.
 */
class OverflowSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine² permille: DECIMAL form exact where co²·1000 wraps BIGINT") {
    // co = 4e9 co-occurrences, ni = nj = 5e9: co²·1000 = 1.6e22 >> 2^63,
    // true cos²·1000 = 1.6e19·1000 / 2.5e19 = 640.
    val df = Seq((4000000000L, 5000000000L, 5000000000L)).toDF("co", "ni", "nj")
    val dec = df.select(expr(
      "CAST(CAST(co AS DECIMAL(38,0)) * co * 1000" +
        " div (CAST(ni AS DECIMAL(38,0)) * nj) AS BIGINT)").as("v"))
      .head().getLong(0)
    assert(dec === 640L)
    // the replaced bare-BIGINT form fails in this regime: ANSI Spark (the
    // 4.x default, what Verify/Bench run) raises ARITHMETIC_OVERFLOW;
    // non-ANSI wraps silently into a wrong permille. Either way ≠ 640.
    val old = scala.util.Try(
      df.select(expr("co * co * 1000 div (ni * nj)").as("v")).head())
    assert(old.isFailure || old.get.isNullAt(0) || old.get.getLong(0) != 640L,
      "bare BIGINT should overflow in this regime")
  }

  test("Simpson diversity: DECIMAL sums exact where Σc² wraps BIGINT") {
    // one token with c = 4e9 (> ~3.04e9 wrap point for c²):
    // sumsq = 1.6e19 > 2^63; with n_tokens = 5e9,
    // simpson = 1000 − 1.6e19·1000 div 2.5e19 = 1000 − 640 = 360.
    val df = Seq(("a", 4000000000L), ("a", 1000000000L)).toDF("source", "c")
    val agg = df.groupBy("source")
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("sumsq"),
        sum(col("c").cast("decimal(38,0)")).as("n_tokens"))
      .withColumn("simpson_permille",
        expr("CAST(1000 - sumsq * 1000" +
          " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)"))
    val v = agg.select("simpson_permille").head().getLong(0)
    // sumsq = 1.6e19 + 1e18 = 1.7e19; n² = 2.5e19 → 1000 − 680 = 320
    assert(v === 320L)
    val old = scala.util.Try(df.groupBy("source")
      .agg(sum(col("c") * col("c")).as("sumsq"), sum("c").as("n_tokens"))
      .withColumn("v", expr("CAST(1000 - sumsq * 1000 div (n_tokens * n_tokens) AS BIGINT)"))
      .select("v").head())
    assert(old.isFailure || old.get.isNullAt(0) || (old.get.getLong(0) != 320L),
      "bare BIGINT should overflow in this regime")
  }

  test("chi-square contrib: DECIMAL square exact where (7n−tot)² wraps") {
    // tot = 7e9, one day n = 3e9 → 7n − tot = 1.4e10, square ~1.96e20 >> 2^63;
    // true contrib = 1.96e20 div 4.9e10 = 4e9.
    val df = Seq((3000000000L, 7000000000L)).toDF("n_orders", "tot")
    val dec = df.select(expr(
      "CAST(CAST(7 * n_orders - tot AS DECIMAL(38,0))" +
        " * (7 * n_orders - tot) div (7 * tot) AS BIGINT)").as("v"))
      .head().getLong(0)
    assert(dec === 4000000000L)
  }

  test("moment sums: DECIMAL Σx² exact where BIGINT wraps") {
    // 4 rows of x ≈ 4e9: Σx² = 6.4e19 > 2^63 — the decimal sums must be
    // EXACT (pinned against BigInt arithmetic), where the replaced
    // BIGINT sum overflows (ANSI error / non-ANSI silent wrap).
    val xs = Seq.tabulate(4)(i => 4000000000L + i)
    val df = xs.map(Tuple1(_)).toDF("x")
    val m = df.agg(
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(col("sx").cast("string"), col("sxx").cast("string")).head()
    val expSx = xs.map(BigInt(_)).sum
    val expSxx = xs.map(x => BigInt(x) * x).sum
    assert(expSxx > BigInt(Long.MaxValue)) // the fixture IS in the wrap regime
    assert(BigInt(m.getString(0)) === expSx)
    assert(BigInt(m.getString(1)) === expSxx)
    val old = scala.util.Try(
      df.agg(sum(col("x") * col("x")).as("s")).select(col("s").cast("string")).head())
    assert(old.isFailure || old.get.isNullAt(0) ||
      (BigInt(old.get.getString(0)) != expSxx),
      "bare BIGINT Σx² should overflow in this regime")
  }

  test("band-bucket candidate pairs: DECIMAL product+sum exact where c·(c−1) wraps") {
    // two buckets of c = 3.5e9: each product c·(c−1) ≈ 1.22e19 > 2^63
    // (the bare-BIGINT wrap regime), each halved value ≈ 6.12e18 still
    // fits, and the SUM ≈ 1.22e19 wraps a BIGINT accumulator — exactly
    // the two residual sites ADVICE r16 flagged (`div`'s BIGINT return
    // and the BIGINT outer sum). The histogram's graduated form — true
    // decimal `/ 2` then a DECIMAL(38,0) sum — must be exact end to
    // end (pinned against BigInt); only the final output cast is lossy,
    // mirroring the oracle's CAST(SUM(HUGEINT…) AS BIGINT).
    val c = 3500000000L
    val df = Seq(("b0", c), ("b1", c)).toDF("bucket", "c")
    val perBucket = BigInt(c) * (c - 1) / 2
    assert(BigInt(c) * (c - 1) > BigInt(Long.MaxValue)) // product wraps
    assert(perBucket * 2 > BigInt(Long.MaxValue))       // BIGINT sum wraps
    val dec = df.agg(
      sum(expr("CAST(CAST(c AS DECIMAL(38,0)) * (c - 1) / 2 AS DECIMAL(38,0))")).as("s"))
      .select(col("s").cast("string")).head().getString(0)
    assert(BigInt(dec) === perBucket * 2)
    val old = scala.util.Try(df.agg(sum(expr("c * (c - 1) div 2")).as("s"))
      .select(col("s").cast("string")).head())
    assert(old.isFailure || old.get.isNullAt(0) || BigInt(old.get.getString(0)) != perBucket * 2,
      "bare BIGINT c*(c-1) div 2 should overflow in this regime")
  }

  test("gini numerator: DECIMAL sum exact where Σ(2i−n−1)·chars wraps") {
    // n = 2 docs with n_chars = 5e18 each (sum representable, but the
    // i=2 term (2·2−2−1)·5e18 = 5e18 and gnum·1000 would wrap):
    // gini numerator = (−1)·5e18 + (1)·5e18 = 0 → gini 0.
    val df = Seq((1L, 5000000000000000000L, 2L), (2L, 5000000000000000000L, 2L))
      .toDF("i", "n_chars", "n")
    val g = df.agg(
      sum(((lit(2L) * col("i") - col("n") - 1L) * col("n_chars"))
        .cast("decimal(38,0)")).as("gnum"),
      count(lit(1)).as("n_docs"), sum(col("n_chars").cast("decimal(38,0)")).as("total"))
      .select(expr("CAST(gnum * 1000 div (CAST(n_docs AS DECIMAL(38,0)) * total) AS BIGINT)").as("v"))
      .head().getLong(0)
    assert(g === 0L)
  }
}
