package graft

import graft.types.CastEngine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The §1.3 cast matrix: every type family + the lenient coercions the
  * reference applies (boolean strings, ISO timestamps, precision-
  * preserving decimals, unknown-type passthrough). */
class CastEngineSpec extends SparkTestBase {
  import spark.implicits._

  private def castOne(value: String, destType: String, pattern: Option[String] = None) =
    Seq(value).toDF("v").select(CastEngine.castTo(col("v"), destType, pattern).as("r"))
      .collect()(0).get(0)

  test("boolean lenient coercion accepts the reference's truthy strings") {
    for (s <- Seq("true", "1", "y", "yes", "Y", "YES", "True", " t "))
      assert(castOne(s, "BOOLEAN") == true, s"'$s' should be true")
    for (s <- Seq("false", "0", "n", "no", "N", "f", "False"))
      assert(castOne(s, "BOOLEAN") == false, s"'$s' should be false")
    assert(castOne("maybe", "BOOLEAN") == null)
    assert(castOne(null, "BOOLEAN") == null)
  }

  test("numeric family") {
    assert(castOne("42", "LONG") == 42L)
    assert(castOne("42", "INTEGER") == 42)
    assert(castOne("42", "SMALLINT") == 42.toShort)
    assert(castOne("42", "TINYINT") == 42.toByte)
    assert(castOne("4.25", "DOUBLE") == 4.25d)
    assert(castOne("4.25", "FLOAT") == 4.25f)
    assert(castOne("123.456", "DECIMAL(10,3)") == new java.math.BigDecimal("123.456"))
  }

  test("decimal default precision preserves the string value exactly") {
    val got = castOne("12345.678901234567891", "BIGDECIMAL")
    assert(got == new java.math.BigDecimal("12345.678901234567891000"))
  }

  test("timestamp/date from ISO strings and explicit patterns") {
    assert(castOne("2025-01-02T10:30:00", "TIMESTAMP") ==
      java.sql.Timestamp.valueOf("2025-01-02 10:30:00"))
    assert(castOne("2025-01-02", "DATE") == java.sql.Date.valueOf("2025-01-02"))
    assert(castOne("02/03/2025", "DATE", Some("dd/MM/yyyy")) ==
      java.sql.Date.valueOf("2025-03-02"))
    assert(castOne("01-02-2025 13:45", "TIMESTAMP", Some("dd-MM-yyyy HH:mm")) ==
      java.sql.Timestamp.valueOf("2025-02-01 13:45:00"))
  }

  test("TIME normalizes to HH:mm:ss string (reference Types.TIME)") {
    assert(castOne("14:30:05", "TIME") == "14:30:05")
    assert(castOne("2:05", "TIME") == "02:05:00")
    assert(castOne("9:7:3", "TIME") == "09:07:03")
    // full timestamp input keeps its time-of-day
    assert(castOne("2026-03-01 23:59:58", "TIME") == "23:59:58")
    // explicit pattern
    assert(castOne("11.45.30", "TIME", Some("H.m.s")) == "11:45:30")
    // malformed -> null, feeding ErrorPolicy like every lenient cast
    assert(castOne("not a time", "TIME") == null)
  }

  test("cast failure yields null (feeding the error-policy path)") {
    assert(castOne("not_a_number", "DECIMAL(10,2)") == null)
    assert(castOne("01/03/2025", "TIMESTAMP") == null) // non-ISO without pattern
  }

  test("unknown type names pass through unchanged") {
    assert(castOne("hello", "SOME_FUTURE_TYPE") == "hello")
    assert(CastEngine.dataTypeFor("???") == None)
  }

  test("type-name dialects: java.sql.Types-ish and logical names agree") {
    assert(CastEngine.dataTypeFor("VARCHAR2") == Some(StringType))
    assert(CastEngine.dataTypeFor("NUMBER") == Some(DoubleType))
    assert(CastEngine.dataTypeFor("BIGINT") == Some(LongType))
    assert(CastEngine.dataTypeFor("DATETIME") == Some(TimestampType))
    assert(CastEngine.dataTypeFor("BIT") == Some(BooleanType))
    assert(CastEngine.dataTypeFor("BLOB") == Some(BinaryType))
    assert(CastEngine.dataTypeFor("decimal(7,2)") == Some(DecimalType(7, 2)))
  }
}
