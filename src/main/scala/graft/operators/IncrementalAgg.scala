package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Incremental aggregate maintenance: keep a materialized per-key
 * summary fresh by MERGING a delta's summary into it, never
 * recomputing the base. The summary carries only mergeable measures
 * (count / exact DECIMAL sum / min / max), so
 *
 *   summarize(base) ⊕ summarize(delta) == summarize(base ∪ delta)
 *
 * holds exactly — the algebra a daily-refresh ETL needs. At 100 TB
 * the refresh touches |delta| + |summary| rows; the history is never
 * scanned again. Valid for APPEND deltas: min/max (and count/sum)
 * merge under inserts only — deletes/updates need a CDC recompute of
 * the affected keys (see Upsert/cdcApply).
 */
object IncrementalAgg {

  /** Raw rows -> mergeable per-key summary. The sum accumulates in
    * DECIMAL (exact, order-independent) — the engine convention for
    * money; cast to DOUBLE only at presentation. */
  def summarize(df: DataFrame, keys: Seq[String], v: Column): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key")
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("agg_cnt"),
      sum(v.cast(DecimalType(18, 2))).as("agg_sum"),
      min(v).as("agg_min"),
      max(v).as("agg_max"))
  }

  /** Two summaries -> the summary of the union of their inputs. Keys
    * present in only one side pass through (full outer semantics via
    * union + re-group). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b, allowMissingColumns = false)
      .groupBy(keys.map(col): _*).agg(
        sum("agg_cnt").as("agg_cnt"),
        sum("agg_sum").as("agg_sum"),
        min("agg_min").as("agg_min"),
        max("agg_max").as("agg_max"))

  // ---- distinct-count maintenance ------------------------------------
  // COUNT(DISTINCT) does not merge — recomputing it per refresh means
  // rescanning the history. The Datasketches HLL sketch DOES merge
  // (per-bucket max is associative/commutative/idempotent):
  //   sketch(base) ∪ sketch(delta) == sketch(base ∪ delta)
  // exactly (same lgK), so a materialized per-key sketch column keeps
  // an approximate distinct fresh at |delta| + |summary| cost. The
  // estimate carries HLL error (~1.04/sqrt(2^lgK), <1% at the default
  // lgK=14); pipelines needing exactness keep the exact path.

  /** Raw rows -> per-key mergeable distinct sketch (binary column). */
  def summarizeDistinct(df: DataFrame, keys: Seq[String], v: Column,
                        lgK: Int = 14): DataFrame = {
    require(keys.nonEmpty, "at least one grouping key")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(v, lit(lgK)).as("distinct_sketch"))
  }

  /** Two sketch summaries -> the sketch summary of the union. */
  def mergeDistinct(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b, allowMissingColumns = false)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("distinct_sketch"), lit(false)).as("distinct_sketch"))

  /** Present a sketch summary: adds `distinct_estimate` (long). */
  def estimateDistinct(summary: DataFrame): DataFrame =
    summary.withColumn("distinct_estimate",
      hll_sketch_estimate(col("distinct_sketch")))

  // ---- incremental JOIN-view maintenance -----------------------------

  /**
   * Delta maintenance of a materialized inner-join view: with
   * append-only deltas ΔA, ΔB on both inputs,
   *
   *   (A ∪ ΔA) ⋈ (B ∪ ΔB)
   *     == V_old  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)
   *
   * by distributivity of ⋈ over ∪ — so the refresh never re-joins the
   * two histories. At 100 TB the three delta joins are each bounded
   * by a delta on one side: ΔA ⋈ B prunes to ΔA's key buckets when B
   * is bucketed/bucket-pruned on the key (the layout tier's bucketed
   * destination); A ⋈ ΔB broadcasts ΔB whenever the dimension delta
   * is small (the common fact/dim case — AQE picks the broadcast);
   * ΔA ⋈ ΔB is delta × delta. Inner-join/append-only algebra only:
   * updates or deletes need the CDC path (Upsert.applyCdcState) to
   * retract affected view rows first.
   */
  def deltaJoin(vOld: DataFrame, aOld: DataFrame, deltaA: DataFrame,
                bOld: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame =
    vOld
      .unionByName(deltaA.join(bOld, keys))
      .unionByName(aOld.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
}
