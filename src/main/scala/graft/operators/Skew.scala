package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for large-scale shuffles (SURVEY.md §7.4.7).
 *
 * AQE's skew-join splitting (on by default) handles most cases at
 * runtime; these are the explicit forms for when the skew is known
 * ahead of time (a handful of hot keys owning a large share of a
 * 100 TB table) or when AQE can't help (aggregation skew):
 *
 *  - `saltedAggregate`: two-phase aggregation — partial by
 *    (keys, salt) spreads one hot key over `buckets` reducers, then a
 *    cheap final merge by keys. Exact for decomposable aggregates.
 *  - `saltedJoin`: the big (skewed) side gets a per-row salt, the
 *    small-ish side is replicated `buckets` times — the hot key's rows
 *    land on `buckets` different reducers instead of one.
 *
 * Salts derive from spark_partition_id + a row counter — no RNG, no
 * correctness dependence on the salt's value (only on its spread).
 */
object Skew {

  /** Decomposable aggregate spec: how to combine partials. */
  sealed trait ReAgg { def partial(c: Column): Column; def merge(c: Column): Column }
  case object SumAgg extends ReAgg { def partial(c: Column) = sum(c); def merge(c: Column) = sum(c) }
  case object CountAgg extends ReAgg { def partial(c: Column) = count(c); def merge(c: Column) = sum(c) }
  case object MinAgg extends ReAgg { def partial(c: Column) = min(c); def merge(c: Column) = min(c) }
  case object MaxAgg extends ReAgg { def partial(c: Column) = max(c); def merge(c: Column) = max(c) }

  private def saltCol(buckets: Int): Column =
    pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(buckets.toLong))

  /**
   * Two-phase salted aggregation. `aggs` maps output name ->
   * (input column, spec). Result equals the direct
   * groupBy(keys).agg(...) for decomposable aggregates, with the hot
   * keys' partials spread over `buckets` reducers first.
   */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Map[String, (Column, ReAgg)],
                      buckets: Int = 16): DataFrame = {
    require(aggs.nonEmpty, "saltedAggregate needs at least one aggregate")
    require(keys.nonEmpty, "saltedAggregate needs at least one grouping key")
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val partialAggs = aggs.map { case (name, (c, spec)) => spec.partial(c).as(name) }.toSeq
    val partial = df.withColumn("_salt", saltCol(buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val mergeAggs = aggs.map { case (name, (_, spec)) => spec.merge(col(name)).as(name) }.toSeq
    partial.groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /**
   * Salted equi-join: `big` (skewed probe side) x `small` (replicated
   * build side), inner join on `keys`. The small side must tolerate
   * `buckets`-fold replication (its shuffle volume multiplies).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    val bigS = big.withColumn("_salt", saltCol(buckets))
    val smallS = small.withColumn("_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    bigS.join(smallS, keys :+ "_salt").drop("_salt")
  }
}
