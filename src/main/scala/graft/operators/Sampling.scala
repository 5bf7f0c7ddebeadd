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
   * Deterministic per-stratum sampling: each stratum (e.g. language,
   * source) keeps its own fraction of rows — the knob for rebalancing
   * a corpus mixture (downsample the dominant language, keep the rare
   * ones whole). Membership is a pure function of the id, exactly like
   * [[hashSplit]]: no RNG, no `sampleBy` nondeterminism, the same rows
   * survive any recomputation. Percentages are integers out of 100.
   *
   * Scale: a filter over a narrow projection — no shuffle, no window,
   * embarrassingly parallel.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       pctByStratum: Map[String, Int], defaultPct: Int,
                       salt: Long = 42L, bucketExpr: Option[Column] = None): DataFrame = {
    require((pctByStratum.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percentages must be in [0, 100]")
    val bucket = bucketExpr.getOrElse(pmod(xxhash64(col(idCol), lit(salt)), lit(100)))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (name, p)) =>
      when(col(strataCol) === name, p).otherwise(acc)
    }
    df.withColumn("sample_bucket", bucket)
      .filter(col("sample_bucket") < pct)
  }

  /**
   * Deterministic per-stratum cap: keep at most `cap` rows per
   * stratum, selected by a deterministic order (hash of the id by
   * default — a uniform "random but reproducible" pick). The window
   * partitions by stratum, so parallelism equals the stratum count;
   * at 100 TB cap within finer shards (stratum × hash-bucket) if a
   * single stratum outweighs an executor.
   */
  def stratifiedCap(df: DataFrame, idCol: String, strataCol: String, cap: Int,
                    salt: Long = 42L, orderExpr: Option[Column] = None): DataFrame = {
    require(cap > 0, "cap must be positive")
    val ord = orderExpr.getOrElse(xxhash64(col(idCol), lit(salt)))
    val w = Window.partitionBy(col(strataCol)).orderBy(ord, col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk")
  }

  /**
   * Deterministic corpus shuffle with an explicit global position:
   * rows are ordered by (bucket, id) where bucket is a hash of the id,
   * and `shuffle_pos` is the 0-based rank in that order — the
   * "shuffle once, train in order" step of a training pipeline.
   *
   * A naive `row_number() OVER (ORDER BY hash)` is a SINGLE-partition
   * window — the one shape that cannot scale. This is the two-phase
   * distributed rank instead: (1) count rows per bucket (map-side
   * partial, `buckets` rows out), (2) prefix-sum those counts into
   * per-bucket offsets — a window over `buckets` rows of METADATA, not
   * data — and broadcast-join them back, (3) rank within each bucket
   * (parallelism = `buckets`). Global position = offset + local rank;
   * no partition ever holds more than ~1/buckets of the corpus.
   */
  def deterministicShuffle(df: DataFrame, idCol: String, buckets: Int = 1 << 12,
                           salt: Long = 42L, bucketExpr: Option[Column] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val b = bucketExpr.getOrElse(pmod(xxhash64(col(idCol), lit(salt)), lit(buckets)))
    val withB = df.withColumn("shuffle_bucket", b)
    val offsets = bucketPrefixOffsets(withB, Nil, "shuffle_bucket",
      count(lit(1)), "_offset")
    withB.join(broadcast(offsets), "shuffle_bucket")
      .withColumn("shuffle_pos",
        col("_offset") + row_number().over(
          Window.partitionBy("shuffle_bucket").orderBy(col(idCol))) - 1)
      .drop("_offset")
  }

  /**
   * Shared scaffolding of the two-phase rank/budget forms: per-bucket
   * totals of `measure`, prefix-summed (EXCLUSIVE) in bucket order
   * within each stratum — a window over <= |strata| x buckets rows of
   * METADATA, meant to be broadcast back to the data. With no strata
   * the single-partition choice is stated via a constant key derived
   * from the bucket column (a bare lit would be foldable and
   * EliminateWindowPartitions would strip it back to the empty spec,
   * resurrecting the "No Partition Defined" warning). Bucket order is
   * Spark's ASC NULLS FIRST: a NULL bucket group sorts first and is
   * charged first.
   */
  private[operators] def bucketPrefixOffsets(df: DataFrame, strata: Seq[String],
                                             bucketCol: String, measure: Column,
                                             offCol: String): DataFrame = {
    val partKeys =
      if (strata.nonEmpty) strata.map(col) else Seq(pmod(col(bucketCol), lit(1)))
    val wOff = Window.partitionBy(partKeys: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.groupBy((strata :+ bucketCol).map(col): _*).agg(measure.as("_bp_n"))
      .withColumn(offCol, coalesce(sum(col("_bp_n")).over(wOff), lit(0L)))
      .drop("_bp_n")
  }

  /**
   * Token-budget cap: keep documents per stratum, in deterministic
   * hash order, until the stratum's cumulative token count reaches
   * `budgetPerStratum` — the "N tokens per domain" knob of a training
   * mixture (row caps over-sample short documents; real budgets are
   * stated in tokens).
   *
   * Scale shape: the naive form is a running `SUM OVER (PARTITION BY
   * stratum ORDER BY hash)` — parallelism = stratum count, so one
   * executor drags an entire domain. This is the two-phase form
   * instead (same design as `deterministicShuffle`): (1) per
   * (stratum, bucket) token sums — `strata x buckets` rows of
   * METADATA; (2) prefix-sum those into per-bucket starting offsets
   * and broadcast them back; (3) a local inclusive running sum within
   * each (stratum, bucket) — parallelism = strata x buckets. A row
   * survives iff bucket offset + local running sum <= budget, which
   * matches the naive form's membership exactly, bucket by bucket.
   * Rows with NULL tokens count as 0 (kept, free); a NULL bucket (a
   * nullable custom `bucketExpr`) forms its own group, joined
   * null-safely and charged first (NULLS FIRST bucket order) — no row
   * is ever silently dropped.
   */
  def tokenBudgetCap(df: DataFrame, idCol: String, strataCol: String,
                     tokenCol: String, budgetPerStratum: Long,
                     buckets: Int = 1 << 10, salt: Long = 42L,
                     bucketExpr: Option[Column] = None): DataFrame = {
    require(budgetPerStratum > 0, "budgetPerStratum must be positive")
    require(buckets > 0, "buckets must be positive")
    val b = bucketExpr.getOrElse(pmod(xxhash64(col(idCol), lit(salt)), lit(buckets)))
    val withB = df.withColumn("_tb_bkt", b)
      .withColumn("_tb_n", coalesce(col(tokenCol).cast("long"), lit(0L)))
    val offsets = bucketPrefixOffsets(withB.select(col(strataCol), col("_tb_bkt"),
        col("_tb_n")), Seq(strataCol), "_tb_bkt", sum("_tb_n"), "_tb_off")
      .withColumnRenamed(strataCol, "_tb_s").withColumnRenamed("_tb_bkt", "_tb_b")
    val wLocal = Window.partitionBy(col(strataCol), col("_tb_bkt"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, 0)
    withB.join(broadcast(offsets),
        col(strataCol) <=> col("_tb_s") && col("_tb_bkt") <=> col("_tb_b"))
      .withColumn("_tb_cum", col("_tb_off") + sum("_tb_n").over(wLocal))
      .filter(col("_tb_cum") <= budgetPerStratum)
      .drop("_tb_s", "_tb_b", "_tb_off", "_tb_bkt", "_tb_n", "_tb_cum")
  }

  /**
   * Weighted domain mixing: the "epochs per source" knob of a training
   * mixture (upsample curated domains, downsample bulk crawl). Each
   * row is emitted `floor(w)` times plus one more with probability
   * `frac(w)`, where w = weightPermille/1000 — so a weight of 2500
   * yields 2-3 copies (expected 2.5) and 300 keeps the row with p=0.3.
   * The fractional coin is a pure function of the id (hash bucket in
   * [0,1000) compared against `weightPermille mod 1000`) — integer
   * arithmetic end-to-end, so membership and multiplicity are exactly
   * reproducible on any engine, run, or partitioning.
   *
   * Scale: a filter + per-row `sequence` explode — no shuffle, no
   * window; each row replicates where it lives. Output adds
   * `mix_weight_permille` and `mix_rep` (0-based replica index).
   * `bucketExpr` overrides the coin (oracles use arithmetic both
   * engines can evaluate; production uses the xxhash64 default).
   */
  def weightedMix(df: DataFrame, idCol: String, weightPermille: Column,
                  salt: Long = 42L, bucketExpr: Option[Column] = None): DataFrame = {
    val bucket = bucketExpr.getOrElse(pmod(xxhash64(col(idCol), lit(salt)), lit(1000)))
    df.withColumn("mix_weight_permille", weightPermille.cast("long"))
      .withColumn("_reps",
        expr("mix_weight_permille div 1000") +
          when(bucket < expr("mix_weight_permille % 1000"), 1L).otherwise(0L))
      .filter(col("_reps") > 0)
      .withColumn("mix_rep", explode(expr("sequence(0, _reps - 1)")))
      .drop("_reps")
  }

  /**
   * Sliding-window document chunking: split each document's token
   * stream into training-context windows of `chunkSize` tokens,
   * starting every `stride` tokens (stride < chunkSize gives the
   * standard overlapping-context chunks; the final chunk may be
   * short). Output adds `chunk_idx` (0-based), `n_chunk_tokens`,
   * `chunk_text`.
   *
   * Scale: a per-row generate + array slice — no shuffle; each
   * document chunks where it lives.
   */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    df.withColumn("_w", split(col(textCol), " "))
      .select(col(idCol), col("_w"),
        posexplode(expr(s"sequence(1, size(_w), $stride)")).as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx"),
        expr(s"size(slice(_w, _start, $chunkSize))").as("n_chunk_tokens"),
        expr(s"array_join(slice(_w, _start, $chunkSize), ' ')").as("chunk_text"))
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
