package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact heavy hitters without a full-vocabulary shuffle.
 *
 * `groupBy(key).count().filter(cnt > n/t)` computes exact counts for
 * EVERY key — at 100 TB that shuffles the entire vocabulary to answer
 * a question about its top sliver. This composition never does:
 *
 *   1. one Misra-Gries sketch aggregation
 *      ([[graft.functions.FreqSketch]], bounded k-entry state,
 *      map-side partial merge) yields a candidate set that PROVABLY
 *      contains every key with count > n/(k+1) — no false negatives
 *      once k+1 >= t;
 *   2. candidates (<= k rows) broadcast back; only rows matching a
 *      candidate are re-counted — exact counts, but the shuffle
 *      carries at most k distinct keys;
 *   3. the exact counts filter against n/t (n from the same scan's
 *      count, broadcast — no driver round-trip).
 *
 * Output: (key, cnt) EXACT for every key with cnt * t > n; nothing
 * else. Two scans of the input, zero full-cardinality shuffles.
 *
 * Null keys are excluded from BOTH the candidates and the denominator
 * n — semantics match `groupBy(key).count()` over the non-null rows
 * (the sketch cannot represent null, so counting nulls into n would
 * silently raise the bar for real keys instead).
 */
object HeavyHitters {

  def exactHeavyHitters(df: DataFrame, key: Column, t: Int,
                        sketchK: Option[Int] = None): DataFrame = {
    require(t >= 2, "t must be >= 2 (threshold is count > n/t)")
    val k = sketchK.getOrElse(2 * t)
    require(k + 1 >= t, s"sketch size $k too small for threshold n/$t — " +
      "completeness needs k+1 >= t")
    val base = df.select(key.cast("string").as("key")).filter(col("key").isNotNull)
    val cands = base
      .agg(graft.functions.FreqAgg.freqSketch(col("key"), k).as("c"))
      .select(explode(col("c")).as("e"))
      .select(col("e.token").as("key"))
    val total = base.agg(count(lit(1)).as("n"))
    base.join(broadcast(cands), "key")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * t > col("n"))
      .select("key", "cnt")
  }
}
