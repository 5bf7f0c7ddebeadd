package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset-assembly operators for the training-data tier: deterministic
 * splits and sequence packing. Both are pure column/window
 * formulations — stable across runs, partitionings, and cluster sizes,
 * which is the property that matters when a 100 TB corpus must
 * reproduce the same train/val membership a month later.
 */
object Sampling {

  /**
   * Deterministic hash split: each row lands in exactly one named
   * split, with integer weights (e.g. train 80 / val 10 / test 10).
   * Assignment is a pure function of the id (default: xxhash64 of the
   * id + salt, uniform and engine-stable) — no RNG state, no
   * `randomSplit` reshuffling nondeterminism, membership survives
   * recomputation and repartitioning.
   *
   * `bucketExpr` overrides the bucketing function (tests/oracles use
   * an arithmetic mix both engines can evaluate; production uses the
   * xxhash64 default). Output adds `split_bucket` and `split`.
   */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[(String, Int)],
                salt: Long = 42L, bucketExpr: Option[Column] = None): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = bucketExpr.getOrElse(pmod(xxhash64(col(idCol), lit(salt)), lit(total)))
    val withB = df.withColumn("split_bucket", bucket)
    var acc = 0
    var labelCol: Column = null
    weights.foreach { case (name, w) =>
      acc += w
      val cond = col("split_bucket") < acc
      labelCol = if (labelCol == null) when(cond, name) else labelCol.when(cond, name)
    }
    withB.withColumn("split", labelCol)
  }

  /**
   * Stream-order sequence packing: within each shard, documents fill
   * context windows ("bins") of `budget` tokens in `idCol` order; a
   * document belongs to the bin where its token run STARTS, so bins
   * can overflow by at most one document — the deterministic,
   * single-window approximation of first-fit packing (exact first-fit
   * is inherently sequential and cannot scale out).
   *
   * The shard key is the scale lever: shards pack independently and in
   * parallel, and per-shard window state is one running sum. At 100 TB
   * shard by date/source/hash-bucket so no single partition holds the
   * global order. Output adds `pack_shard`, `n_tokens`, `bin`.
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
                    shardCol: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = df.withColumn("pack_shard", shardCol).withColumn("n_tokens", tokensCol)
    val w = Window.partitionBy(col("pack_shard")).orderBy(col(idCol))
    base
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
  }
}
