package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Column profiling: the data-quality survey an ETL shop runs before
 * wiring mappings — per column: row/null/distinct counts and min/max.
 * (Reference parity-plus: its VALIDATE_SOURCE step checks only
 * readability/row counts — workflowEngine-part1.java:283-303 — while
 * operators here make the reference's implicit "inspect the source
 * first" workflow a first-class operator.)
 *
 * One pass over the data: every per-column measure is an aggregate of
 * the SAME scan, assembled into a tall (column, stats) table with a
 * single `stack`. Numeric min/max surface as DOUBLE, string min/max
 * as STRING — two typed column pairs instead of one stringly-typed
 * pair, so no cross-engine number-formatting ambiguity exists.
 *
 * Scale: `exact = true` uses COUNT(DISTINCT) — Spark plans multiple
 * distinct aggregates via Expand (one row replica per distinct
 * measure), fine into the billions but it IS a multiplied shuffle.
 * `exact = false` swaps in approx_count_distinct (HLL, 2% default) —
 * constant-size sketch state per column, the 100 TB default.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no such column: $c"))
    // names are interpolated into the stack() expression below —
    // restrict to plain identifiers rather than attempt escaping
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile needs plain identifier column names, got: $c"))
    def isNum(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _              => false
    }
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val measures: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        nd(c).as(s"_nd_$c"),
        (if (isNum(c)) min(col(c)).cast(DoubleType) else lit(null).cast(DoubleType)).as(s"_minn_$c"),
        (if (isNum(c)) max(col(c)).cast(DoubleType) else lit(null).cast(DoubleType)).as(s"_maxn_$c"),
        (if (isNum(c)) lit(null).cast(StringType) else min(col(c)).cast(StringType)).as(s"_mins_$c"),
        (if (isNum(c)) lit(null).cast(StringType) else max(col(c)).cast(StringType)).as(s"_maxs_$c"))
    }
    val wide = df.agg(measures.head, measures.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', _n, _n - _nn_$c, _nd_$c, _minn_$c, _maxn_$c, _mins_$c, _maxs_$c"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"))
  }

  /**
   * Exact-integer population-stability index (×1e6) between a current
   * and a reference relation over fixed value bands — the shared
   * closure behind the `etl_distribution_drift_psi` gate query, the
   * `events_stream_drift_psi` streaming monitor, and the
   * VALIDATE_DRIFT job step. Discipline: bands come from [[psiBand]]
   * (the ONE banding convention all three PSI surfaces share), counts
   * get +1 smoothing so an empty band can't blow up the log, the log
   * argument is an exact integer ratio (identical IEEE before the one
   * ln), and each band contributes one BIGINT floor division.
   *
   * Scale: two map-side banded counts + a bands-sized spine join; the
   * returned value is a one-row collect (metadata).
   */
  def psiMicro(cur: DataFrame, ref: DataFrame, valueCol: String,
               bandWidth: Double, bands: Int = 10): Long = {
    val spark = cur.sparkSession
    def hist(df: DataFrame) = df
      .select(psiBand(valueCol, bandWidth, bands).as("band"))
      .groupBy("band").agg(count(lit(1)).as("k"))
    val c = hist(cur).withColumnRenamed("k", "c")
    val r = hist(ref).withColumnRenamed("k", "r")
    val row = spark.range(0, bands).select(col("id").as("band"))
      .join(c, Seq("band"), "left").join(r, Seq("band"), "left")
      .select(col("band"),
        coalesce(col("c"), lit(0L)).as("c"), coalesce(col("r"), lit(0L)).as("r"))
      .crossJoin(broadcast(
        c.agg(coalesce(sum("c"), lit(0L)).as("nt"))
          .crossJoin(r.agg(coalesce(sum("r"), lit(0L)).as("mt")))))
      // era-count products (c·M, N·M) wrap 2^63 past ~1e8 rows per era:
      // the log argument multiplies factor-cast doubles and the rational
      // rides DECIMAL(38,0) — the etl_distribution_drift_psi discipline.
      .withColumn("lq_micro",
        round(log(((col("c") + 1).cast("double") * (col("mt") + bands)) /
          ((col("r") + 1).cast("double") * (col("nt") + bands))) * 1000000)
          .cast("long"))
      .agg(sum(expr(
        s"CAST((CAST(c + 1 AS DECIMAL(38,0)) * (mt + $bands)" +
          s" - CAST(r + 1 AS DECIMAL(38,0)) * (nt + $bands)) * lq_micro" +
          s" div (CAST(nt + $bands AS DECIMAL(38,0)) * (mt + $bands)) AS BIGINT)"))
        .as("psi_micro"))
      .collect()(0)
    row.getLong(0)
  }

  /**
   * The ONE PSI banding convention, shared verbatim by [[psiMicro]]
   * (VALIDATE_DRIFT), the `etl_distribution_drift_psi` batch gate, and
   * `EventStreams.driftPsiStream`: floor(value/bandWidth) CLAMPED into
   * [0, bands). Every row lands in exactly one band — below-range
   * values (and NULLs: Spark's greatest skips nulls, so a null floor
   * collapses to the 0 bound) take band 0, above-range values take
   * band bands-1 — so per-band counts always sum to the era total and
   * the three surfaces report the same psi_micro for the same data.
   */
  def psiBand(valueCol: String, bandWidth: Double, bands: Int): Column =
    least(greatest(
      expr(s"CAST(floor($valueCol / $bandWidth) AS BIGINT)"), lit(0L)),
      lit(bands - 1L))
}
