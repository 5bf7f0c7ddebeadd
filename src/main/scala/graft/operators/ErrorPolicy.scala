package graft.operators

import graft.model.{ErrorHandling, FieldMapping}
import graft.types.CastEngine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
        val bad = s.bad.persist()
        try {
          val n = bad.count()
          // Nulls routed to file are written as empty strings, matching
          // the reference CSV writer (ETLCoreCsvFileWriter.java:161-164).
          bad.write.mode("overwrite").option("header", "true").option("emptyValue", "").csv(path)
          checkMax(n, policy)
          (s.good, n)
        } finally bad.unpersist()
      case other =>
        throw new IllegalArgumentException(s"unknown error strategy: $other")
    }
  }

  private def checkMax(n: Long, policy: ErrorHandling): Unit =
    if (policy.maxErrorsAllowed > 0 && n > policy.maxErrorsAllowed)
      throw new JobFailedException(
        s"recordsFailed=$n exceeds maxErrorsAllowed=${policy.maxErrorsAllowed}")
}
