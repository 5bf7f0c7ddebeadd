package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for training corpora: emails, phone-shaped numbers,
 * and long id-like digit runs are replaced with typed placeholder
 * tokens. Pure regexp_replace chain — codegen'd, partition-parallel,
 * no UDFs; patterns stay inside the regex subset shared by Java regex
 * and RE2 so the DuckDB oracle can pin the semantics.
 *
 * Order matters: emails first (their local parts can contain digit
 * runs), then phones (digit groups with separators), then bare long
 * digit runs.
 */
object Privacy {

  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b"
  val IdPattern    = "\\b\\d{6,}\\b"

  /** text -> text with [EMAIL]/[PHONE]/[ID] placeholders. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      IdPattern, "[ID]")

  /** Per-row PII hit counts (for corpus audits): how many of each
    * class the scrub WOULD replace. */
  def piiCounts(c: Column): (Column, Column, Column) = (
    size(regexp_extract_all(c, lit(EmailPattern), lit(0))),
    size(regexp_extract_all(regexp_replace(c, EmailPattern, "[EMAIL]"), lit(PhonePattern), lit(0))),
    size(regexp_extract_all(
      regexp_replace(regexp_replace(c, EmailPattern, "[EMAIL]"), PhonePattern, "[PHONE]"),
      lit(IdPattern), lit(0)))
  )
}
