package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Lenient, declarative cast engine.
 *
 * Re-expresses the reference engine's three cast layers
 * (reference: ETLCoreMappingProcessor.java:149-253,
 * JdbcTypeHandler.java:33-149,161-328, docx §5 convertAndValidateType)
 * as pure `Column => Column` transforms so Catalyst can fold/codegen
 * them — no per-row driver logic, no UDFs.
 *
 * Semantics preserved from the reference:
 *  - type names are strings from either dialect (java.sql.Types-ish
 *    names like VARCHAR2/NUMBER/DATETIME, and logical names like
 *    STRING/LONG/TIMESTAMP) — ETLCoreMappingProcessor.java:158-233;
 *  - boolean coercion accepts "true"/"1"/"y"/"yes" case-insensitively
 *    (ETLCoreMappingProcessor.java:193-197);
 *  - DECIMAL goes through a precision-preserving path
 *    (ETLCoreMappingProcessor.java:186) — DecimalType(38,18) default;
 *  - TIMESTAMP/DATE accept ISO strings, with an optional explicit
 *    `formatPattern` (etlModel.java:102-103);
 *  - unknown type names pass through unchanged with no error
 *    (ETLCoreMappingProcessor.java:236-239).
 */
object CastEngine {

  /** String type name (either reference dialect) -> Spark DataType.
    * None = pass-through (unknown or explicitly untyped). */
  def dataTypeFor(name: String): Option[DataType] = {
    val full = Option(name).getOrElse("").trim.toUpperCase
    val n = full.takeWhile(c => c != '(').trim // tolerate "DECIMAL (10,2)"
    n match {
      case "STRING" | "VARCHAR" | "VARCHAR2" | "NVARCHAR" | "CHAR" | "NCHAR" | "TEXT" | "CLOB" | "NCLOB" | "LONGVARCHAR" =>
        Some(StringType)
      case "LONG" | "BIGINT" | "INT8" => Some(LongType)
      case "INTEGER" | "INT" | "INT4" => Some(IntegerType)
      case "SMALLINT" | "SHORT" | "INT2" => Some(ShortType)
      case "TINYINT" | "BYTE" => Some(ByteType)
      // Oracle NUMBER with an explicit (p,s) is exact — routing it
      // through double would corrupt 16+ digit keys/amounts
      case "NUMBER" if full.contains("(") => Some(parseDecimal(full))
      case "DOUBLE" | "FLOAT8" | "NUMBER" => Some(DoubleType) // NUMBER w/o precision info -> double
      case "FLOAT" | "REAL" | "FLOAT4" => Some(FloatType)
      case "DECIMAL" | "NUMERIC" | "BIGDECIMAL" => Some(parseDecimal(full))
      case "BOOLEAN" | "BIT" | "BOOL" => Some(BooleanType)
      case "TIMESTAMP" | "DATETIME" | "TIMESTAMPTZ" | "TIMESTAMP_WITH_TIMEZONE" | "INSTANT" =>
        Some(TimestampType)
      case "DATE" => Some(DateType)
      case "TIME" | "TIME_WITH_TIMEZONE" => Some(StringType) // normalized "HH:mm:ss" string (see toTimeLenient)
      case "BINARY" | "VARBINARY" | "BLOB" | "BYTES" | "LONGVARBINARY" => Some(BinaryType)
      case "JSON" | "XML" | "SQLXML" => Some(StringType)
      case _ => None
    }
  }

  /** DECIMAL(p,s) spec parse; bare DECIMAL -> (38,18) like the
    * reference's unconstrained BigDecimal path. */
  private def parseDecimal(name: String): DecimalType = {
    val spec = "\\((\\d+)\\s*,\\s*(\\d+)\\)".r
    spec.findFirstMatchIn(name) match {
      case Some(m) => DecimalType(m.group(1).toInt, m.group(2).toInt)
      case None    => DecimalType(38, 18)
    }
  }

  /** Lenient boolean: true for "true"/"1"/"y"/"yes" (any case), false
    * for "false"/"0"/"n"/"no", null otherwise; non-strings use native
    * cast. Mirrors ETLCoreMappingProcessor.java:193-197. */
  def booleanLenient(c: Column): Column = {
    val s = lower(trim(c.cast(StringType)))
    when(s.isNull, lit(null).cast(BooleanType))
      .when(s.isin("true", "1", "y", "yes", "t"), lit(true))
      .when(s.isin("false", "0", "n", "no", "f"), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** Timestamp with ISO fallback chain (ETLCoreMappingProcessor.java:200-217):
    * explicit pattern if given, else native cast (covers ISO instant /
    * 'yyyy-MM-dd HH:mm:ss' / date-only). try_* forms: under ANSI mode
    * (Spark 4 default) a plain cast/parse THROWS on malformed input —
    * the reference instead routes the row to the error path (P4/E1),
    * which is exactly null-propagation + ErrorPolicy. */
  def toTimestampLenient(c: Column, pattern: Option[String]): Column = pattern match {
    case Some(p) => try_to_timestamp(c.cast(StringType), lit(p))
    case None    => c.try_cast(TimestampType)
  }

  def toDateLenient(c: Column, pattern: Option[String]): Column = pattern match {
    case Some(p) => try_to_date(c.cast(StringType), p)
    case None    => c.try_cast(DateType)
  }

  private def isTimeName(name: String): Boolean = {
    val n = Option(name).getOrElse("").trim.toUpperCase.takeWhile(_ != '(').trim
    n == "TIME" || n == "TIME_WITH_TIMEZONE"
  }

  /** TIME-of-day (reference Types.TIME, JdbcTypeHandler.java:87-92 —
    * a java.sql.Time, i.e. an HH:mm:ss wall-clock value): parsed
    * leniently ("14:30:05", "2:05", or an explicit pattern) and
    * normalized to an "HH:mm:ss" STRING — the portable form across
    * file sinks and the oracle; malformed input nulls out like every
    * other lenient cast. */
  def toTimeLenient(c: Column, pattern: Option[String]): Column = {
    val s = trim(c.cast(StringType))
    val ts = pattern match {
      case Some(p) => try_to_timestamp(s, lit(p))
      case None => coalesce(
        try_to_timestamp(s, lit("H:m:s")),
        try_to_timestamp(s, lit("H:m")),
        try_to_timestamp(s)) // full timestamp input: keep its time part
    }
    date_format(ts, "HH:mm:ss")
  }

  /**
   * The cast: source column -> destination-typed column.
   * `destType` is the string type name; `pattern` an optional
   * date/number format. Unknown names pass through (reference logs a
   * warning and forwards the value — ETLCoreMappingProcessor.java:236-239).
   * Malformed values become null (try_cast), feeding ErrorPolicy —
   * never a runtime exception mid-pipeline.
   */
  def castTo(c: Column, destType: String, pattern: Option[String] = None): Column =
    if (isTimeName(destType)) toTimeLenient(c, pattern)
    else dataTypeFor(destType) match {
      case Some(BooleanType)   => booleanLenient(c)
      case Some(TimestampType) => toTimestampLenient(c, pattern)
      case Some(DateType)      => toDateLenient(c, pattern)
      case Some(dt: DecimalType) => c.cast(StringType).try_cast(dt) // precision-preserving string path (:186)
      case Some(dt)            => c.try_cast(dt)
      case None                => c
    }
}
