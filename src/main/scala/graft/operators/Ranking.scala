package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalable window ranking for LOW-CARDINALITY partition keys.
 *
 * `rank() OVER (PARTITION BY p ORDER BY k)` hash-distributes on `p`:
 * with 3 distinct partition values, a 1000-executor cluster sorts the
 * entire table in 3 tasks — the classic window bottleneck at scale.
 * This operator computes the same six ranking functions with
 * parallelism `|p| × buckets` instead of `|p|`:
 *
 *   phase 0  per-`p` approximate quantiles of the leading sort key
 *            become bucket boundaries — a tiny (|p| rows) aggregate
 *            that is broadcast, never collected;
 *   phase 1  each row gets a bucket from the boundaries (a pure
 *            map-side array scan), then ranks LOCALLY inside
 *            (p, bucket) — the only full-data shuffle, on a key of
 *            cardinality |p| × buckets;
 *   phase 2  per-(p, bucket) row/distinct-key counts (reuses phase
 *            1's partitioning — no extra full-data exchange) prefix-
 *            sum into offsets on metadata-sized data, broadcast-join
 *            back, and local ranks shift into global ones.
 *
 * Correctness of the split: a bucket is a function of the leading
 * sort-key VALUE (boundaries compare with strict `<`), so tied keys
 * can never straddle a bucket boundary — rank arithmetic composes
 * exactly, and approximation in the quantile sketch skews only bucket
 * SIZES, never results. Equality with the single-window form is
 * pinned by RankingSpec and the window_rank_scalable oracle.
 *
 * The leading sort key must be orderable by `<` in both engines
 * (numeric/date/timestamp/string); remaining `orderCols` are
 * arbitrary. Ties on the FULL key make row_number nondeterministic
 * (as with any window row_number) — use a unique composite key when
 * determinism matters.
 */
object Ranking {

  /**
   * Adds `rank`, `dense_rank`, `row_number`, `percent_rank`,
   * `cume_dist` (and `ntile` when `ntiles` is set) over
   * `PARTITION BY partCol ORDER BY orderCols`.
   */
  def segmentedRanks(df: DataFrame, partCol: String, orderCols: Seq[String],
                     buckets: Int = 32, ntiles: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column")
    require(buckets >= 1, "buckets must be >= 1")
    val k1 = orderCols.head

    // phase 0: boundaries per partition value (|p| rows, broadcast).
    // Boundaries and the probe key are compared in DOUBLE: long→double
    // is monotonic, so equal keys stay equal and order never flips —
    // precision loss can only skew bucket sizes, not results.
    val pcts = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets == 1) null
      else df.groupBy(col(partCol))
        .agg(percentile_approx(col(k1).cast("double"), lit(pcts), lit(10000)).as("_bs"))

    // phase 1: bucket assignment is a map-side codegen scan of <=31
    // boundary values (graft ArrayCountLess — the HOF filter() form
    // runs interpreted); strict `<` keeps every tie of the leading
    // key in ONE bucket, which is what makes the offset arithmetic
    // exact
    val bucketed =
      if (buckets == 1) df.withColumn("_bkt", lit(0))
      else df.join(broadcast(bounds), Seq(partCol))
        .withColumn("_bkt", graft.functions.ArrayCountLess.countLess(
          col("_bs"), col(k1).cast("double")))
        .drop("_bs")

    val ord = orderCols.map(col)
    val wLocal = Window.partitionBy(col(partCol), col("_bkt")).orderBy(ord: _*)
    // descending rank in the SAME window clustering (one more sort,
    // zero extra shuffles) gives the rank-of-last-peer that cume_dist
    // needs: rows<=key locally = n_bucket - rank_desc + 1
    val wLocalDesc = Window.partitionBy(col(partCol), col("_bkt"))
      .orderBy(ord.map(_.desc): _*)
    val keyStruct = struct(ord: _*)
    val local = bucketed
      .withColumn("_lrn", row_number().over(wLocal))
      .withColumn("_lrk", rank().over(wLocal))
      .withColumn("_ldr", dense_rank().over(wLocal))
      .withColumn("_lrkd", rank().over(wLocalDesc))

    // phase 2: offsets, aggregated from `bucketed` (NOT from the
    // window output — the ranks aren't needed for counts, and taking
    // the pre-window subtree keeps the shared scan's second execution
    // a cheap partial-agg instead of a re-sorted window).
    val stats = bucketed.groupBy(col(partCol), col("_bkt"))
      .agg(count(lit(1)).as("_n"), countDistinct(keyStruct).as("_nk"))
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = stats
      .withColumn("_off", coalesce(sum("_n").over(wOff), lit(0L)))
      .withColumn("_doff", coalesce(sum("_nk").over(wOff), lit(0L)))
      .withColumn("_tot", sum("_n").over(Window.partitionBy(col(partCol))))
      .drop("_nk")

    val joined = local.join(broadcast(offs), Seq(partCol, "_bkt"))
    val rn = col("_off") + col("_lrn")
    val base = joined
      .withColumn("rank", col("_off") + col("_lrk"))
      .withColumn("dense_rank", col("_doff") + col("_ldr"))
      .withColumn("row_number", rn)
      .withColumn("percent_rank",
        when(col("_tot") === 1L, 0.0)
          .otherwise((col("rank") - 1L).cast("double") / (col("_tot") - 1L)))
      .withColumn("cume_dist",
        (col("_off") + col("_n") - col("_lrkd") + 1L).cast("double") / col("_tot"))
    val tiled = ntiles match {
      case None => base
      case Some(n) =>
        // exact NTILE: first (tot % n) tiles get (tot div n)+1 rows.
        // Integer division via floor over doubles — counts stay far
        // under 2^53, so the double quotient is exact.
        def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          floor(a / b).cast("long")
        val q = idiv(col("_tot"), lit(n.toLong))
        val r = col("_tot") % n
        val cut = r * (q + 1L)
        base.withColumn("ntile",
          when(q === 0L, rn) // fewer rows than tiles: tile == row_number
            .when(rn <= cut, idiv(rn - 1L, q + 1L) + 1L)
            .otherwise(r + idiv(rn - cut - 1L, q) + 1L))
    }
    tiled.drop("_bkt", "_lrn", "_lrk", "_ldr", "_lrkd", "_n", "_off", "_doff", "_tot")
  }
}
