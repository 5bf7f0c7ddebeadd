package graft.operators

import graft.model.{ErrorHandling, FieldMapping}
import graft.types.CastEngine
import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/**
 * Data-quality / error-handling operators — first-class in the
 * reference (SURVEY.md §2.6).
 *
 * A row is INVALID when a non-nullable destination column is null
 * after mapping — which covers both "null arrived from the source"
 * and "cast failed and produced null" (the reference treats cast
 * exceptions and null-violations through the same error path,
 * ETLCoreMappingProcessor.java:66-77,100-135).
 *
 * Strategy semantics (CoreLibInterfaces.java:91-96):
 *  - FAIL_JOB (default): any invalid row aborts the job;
 *  - LOG_ONLY: invalid rows are dropped and counted;
 *  - ROUTE_TO_FILE: invalid rows are written to `errorFilePath`;
 *  - in all non-FAIL modes, invalidCount > maxErrorsAllowed (when > 0)
 *    still fails the job (ETLCoreMappingProcessor.java:127-133).
 *
 * Spark-first: the split is two lazy DataFrames off one predicate;
 * counting happens as an aggregation, not a per-row mutable counter —
 * order-insensitive but count-equivalent (SURVEY.md §7.4.3).
 */
object ErrorPolicy {

  final case class Split(good: DataFrame, bad: DataFrame, requiredCols: Seq[String])

  final class JobFailedException(msg: String) extends RuntimeException(msg)

  /** Predicate: this row violates some non-nullable destination column. */
  def violationPredicate(mappings: Seq[FieldMapping]): Option[Column] = {
    val required = mappings.filterNot(_.isDestNullable).map(m => col(m.destinationFieldName).isNull)
    required.reduceOption(_ || _)
  }

  /** Split a MAPPED DataFrame into (good, bad) on null-constraint
    * violations. No action is triggered here. */
  def split(mapped: DataFrame, mappings: Seq[FieldMapping]): Split =
    violationPredicate(mappings) match {
      case Some(isBad) =>
        Split(mapped.filter(!coalesce(isBad, lit(false))), mapped.filter(coalesce(isBad, lit(false))),
          mappings.filterNot(_.isDestNullable).map(_.destinationFieldName))
      case None => Split(mapped, mapped.limit(0), Nil)
    }

  /**
   * Enforce the configured strategy. Returns the good DataFrame and
   * the number of rejected rows. Triggers at most one action on the
   * bad side (a count, or a CSV write for ROUTE_TO_FILE); the good
   * side stays lazy for the caller's own write.
   */
  def enforce(mapped: DataFrame, mappings: Seq[FieldMapping], policy: ErrorHandling): (DataFrame, Long) = {
    val s = split(mapped, mappings)
    if (s.requiredCols.isEmpty) return (s.good, 0L)
    policy.strategy.toUpperCase match {
      case "FAIL_JOB" =>
        // isEmpty only scans until the first violation — cheap fail-fast.
        if (!s.bad.isEmpty)
          throw new JobFailedException(
            s"null constraint violated on non-nullable column(s) ${s.requiredCols.mkString(",")} (strategy=FAIL_JOB)")
        (s.good, 0L)
      case "LOG_ONLY" =>
        val n = s.bad.count()
        checkMax(n, policy)
        (s.good, n)
      case "ROUTE_TO_FILE" =>
        val path = policy.errorFilePath.getOrElse(
          throw new IllegalArgumentException("ROUTE_TO_FILE requires errorFilePath"))
        // Single pass over the bad side: the row count rides the routing
        // write as an observed metric (no persist, no second scan).
        val obs = Observation(s"graft_routed_${obsSeq.incrementAndGet()}")
        // Nulls routed to file are written as empty strings, matching
        // the reference CSV writer (ETLCoreCsvFileWriter.java:161-164).
        s.bad.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").option("header", "true").option("emptyValue", "").csv(path)
        val n = observedLong(obs, "n")
        checkMax(n, policy)
        (s.good, n)
      case other =>
        throw new IllegalArgumentException(s"unknown error strategy: $other")
    }
  }

  /** Enforcement whose violation count is collected in the SAME pass as
    * the caller's own downstream action (write/collect), via a
    * CollectMetrics (`observe`) node below the good-row filter — no
    * separate counting scan over the source.
    *
    * `rejected()` blocks until the caller has run its first action on
    * `good`, then returns the count. Single-pass only applies to
    * UNCAPPED LOG_ONLY: a configured maxErrorsAllowed must be able to
    * fail the job BEFORE the destination write, which requires the
    * eager counting pass (correctness over the saved scan). FAIL_JOB
    * and ROUTE_TO_FILE likewise need their own action on the bad side
    * (fail-fast probe / routed write) and fall back to `enforce`. */
  def enforceObserved(mapped: DataFrame, mappings: Seq[FieldMapping],
                      policy: ErrorHandling): Enforced =
    violationPredicate(mappings) match {
      case Some(isBad) if policy.strategy.equalsIgnoreCase("LOG_ONLY")
          && policy.maxErrorsAllowed <= 0 =>
        val bad = coalesce(isBad, lit(false))
        val obs = Observation(s"graft_bad_${obsSeq.incrementAndGet()}")
        val observed = mapped.observe(obs,
          coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as("bad"))
        Enforced(observed.filter(!bad), () => observedLong(obs, "bad"))
      case Some(_) =>
        val (good, n) = enforce(mapped, mappings, policy)
        Enforced(good, () => n)
      case None => Enforced(mapped, () => 0L)
    }

  final case class Enforced(good: DataFrame, rejected: () => Long)

  private val obsSeq = new AtomicLong()

  private def observedLong(obs: Observation, key: String): Long =
    obs.get.get(key).map(_.asInstanceOf[Number].longValue).getOrElse(0L)

  private def checkMax(n: Long, policy: ErrorHandling): Unit =
    if (policy.maxErrorsAllowed > 0 && n > policy.maxErrorsAllowed)
      throw new JobFailedException(
        s"recordsFailed=$n exceeds maxErrorsAllowed=${policy.maxErrorsAllowed}")
}
