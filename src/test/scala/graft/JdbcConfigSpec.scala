package graft

import graft.model.{ConnectionDetails, SourceConfig}
import graft.sources.Readers
import graft.types.CastEngine
import org.apache.spark.sql.functions._

/** JDBC source/sink configuration surface (S1-S3/W1) — no database in
  * the harness, so these pin the config -> reader-options contract and
  * its failure modes; plus remaining cast-family corners. */
class JdbcConfigSpec extends SparkTestBase {
  import spark.implicits._

  test("JDBC source requires jdbcUrl, and tableName or query") {
    val noUrl = SourceConfig("JDBC", ConnectionDetails(tableName = Some("t")))
    val e1 = intercept[IllegalArgumentException](Readers.jdbc(spark, noUrl))
    assert(e1.getMessage.contains("jdbcUrl"))
    val noTable = SourceConfig("JDBC", ConnectionDetails(jdbcUrl = Some("jdbc:h2:mem:x")))
    val e2 = intercept[IllegalArgumentException](Readers.jdbc(spark, noTable))
    assert(e2.getMessage.contains("tableName or query"))
  }

  test("JDBC table name is sanitized like the reference") {
    // ItemWriterFactory.java:135 strips [^a-zA-Z0-9_.]
    assert(Readers.sanitizeIdent("sales; DROP TABLE x--") == "salesDROPTABLEx")
    assert(Readers.sanitizeIdent("schema.table_1") == "schema.table_1")
  }

  test("password comes from env indirection, never config literals") {
    // passwordEnv names a variable; an unset variable -> no password option
    val cfg = SourceConfig("JDBC", ConnectionDetails(
      jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t"),
      passwordEnv = Some("GRAFT_TEST_UNSET_ENV_VAR")))
    // an unset env var must NOT fail config assembly — the failure must
    // come later, from driver resolution (none on this classpath)
    val e = intercept[java.sql.SQLException](Readers.jdbc(spark, cfg))
    assert(e.getMessage.contains("No suitable driver"))
  }

  test("binary cast family and pass-through types") {
    val r = Seq("hello").toDF("s")
      .select(CastEngine.castTo(col("s"), "BINARY").as("b"),
        CastEngine.castTo(col("s"), "BLOB").as("bl"))
      .collect()(0)
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "hello")
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == "hello")
  }

  test("TIME-ish and JSON/XML types surface as strings") {
    import org.apache.spark.sql.types._
    assert(CastEngine.dataTypeFor("TIME") == Some(StringType))
    assert(CastEngine.dataTypeFor("JSON") == Some(StringType))
    assert(CastEngine.dataTypeFor("SQLXML") == Some(StringType))
  }
}
