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

  test("reference flagship E2E, live: JSON job config -> JDBC source -> mapping -> CSV sink") {
    // the reference's jobconfigex.json shape (JDBC read, rename/cast
    // mappings, filter, CSV destination) executing end to end against
    // a real embedded Derby database through the full JobRunner path
    Readers.ensureDerbyHome()
    val dbDir = tmpDir("jobjdbc")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    // seed the database with a customer subset (the "source system")
    graft.sinks.Writers.write(
      Tables.t(spark, sf, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
      graft.model.DestinationConfig("JDBC", ConnectionDetails(
        jdbcUrl = Some(url), tableName = Some("CUSTOMER_SRC"),
        createTableColumnTypes = Some("c_name VARCHAR(64), c_mktsegment VARCHAR(16)"))))
    val out = tmpDir("jobjdbc_out")
    val cfgJson = s"""{
      "jobId": "jdbc-to-csv-live",
      "source": {"type": "JDBC", "connectionDetails": {
        "jdbcUrl": "$url", "tableName": "CUSTOMER_SRC", "fetchSize": 500}},
      "destination": {"type": "CSV", "connectionDetails": {"path": "$out/dest"}},
      "mappings": [
        {"sourceFieldName": "c_custkey", "destinationFieldName": "CustomerID",
         "destFieldType": "LONG", "isDestNullable": false},
        {"sourceFieldName": "c_name", "destinationFieldName": "Name",
         "destFieldType": "STRING", "transformationRule": "UPPERCASE"},
        {"sourceFieldName": "c_acctbal", "destinationFieldName": "Balance",
         "destFieldType": "DOUBLE"}
      ],
      "steps": ["VALIDATE_SOURCE", "LOAD", "VALIDATE_LOAD", "NOTIFY_SUCCESS"]
    }"""
    val res = graft.job.JobRunner.run(spark, graft.model.JobConfig.fromJson(cfgJson))
    assert(res.status == graft.job.JobRunner.Completed, res.message)
    val want = Tables.t(spark, sf, "customer").count()
    assert(res.recordsWritten == want, s"wrote ${res.recordsWritten}, source had $want")
    val back = spark.read.option("header", "true").csv(s"$out/dest")
    assert(back.count() == want)
    assert(back.columns.toSeq == Seq("CustomerID", "Name", "Balance"))
    // the UPPERCASE transformation rule applied through the live path
    val names = back.select("Name").limit(50).collect().map(_.getString(0))
    assert(names.nonEmpty && names.forall(n => n == n.toUpperCase))
  }

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

  test("password comes from env indirection, never config literals; unset var fails fast") {
    // passwordEnv names a variable; a configured-but-UNSET variable is
    // a deployment error and must fail with the variable's name, not
    // proceed to an opaque auth failure with no password
    val cfg = SourceConfig("JDBC", ConnectionDetails(
      jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t"),
      passwordEnv = Some("GRAFT_TEST_UNSET_ENV_VAR")))
    val e = intercept[IllegalArgumentException](Readers.jdbc(spark, cfg))
    assert(e.getMessage.contains("GRAFT_TEST_UNSET_ENV_VAR"))
    // no passwordEnv at all = unauthenticated by intent -> proceeds to
    // driver resolution (none on this classpath)
    val anon = SourceConfig("JDBC", ConnectionDetails(
      jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t")))
    val e2 = intercept[java.sql.SQLException](Readers.jdbc(spark, anon))
    assert(e2.getMessage.contains("No suitable driver"))
  }

  test("NUMBER with explicit precision is exact decimal, not double") {
    import org.apache.spark.sql.types._
    assert(CastEngine.dataTypeFor("NUMBER(38,0)") == Some(DecimalType(38, 0)))
    assert(CastEngine.dataTypeFor("NUMBER(18,2)") == Some(DecimalType(18, 2)))
    assert(CastEngine.dataTypeFor("NUMBER") == Some(DoubleType)) // no precision info
    // space before the paren must not disable the cast
    assert(CastEngine.dataTypeFor("DECIMAL (10,2)") == Some(DecimalType(10, 2)))
    // an 18+ digit key survives exactly
    val r = Seq("123456789012345678").toDF("s")
      .select(CastEngine.castTo(col("s"), "NUMBER(38,0)").as("v")).collect()(0)
    assert(r.getDecimal(0).toBigInteger.toString == "123456789012345678")
  }

  test("partitioned scan needs the full stride spec; partial spec falls back, not fails") {
    // partitionColumn without bounds used to hit Spark's JDBCOptions
    // IllegalArgumentException at load(); now it degrades to a
    // single-partition scan and fails only on the (absent) driver.
    val partial = SourceConfig("JDBC", ConnectionDetails(
      jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t"),
      partitionColumn = Some("id"), numPartitions = Some(8)))
    val e1 = intercept[java.sql.SQLException](Readers.jdbc(spark, partial))
    assert(e1.getMessage.contains("No suitable driver"))
    // the full spec is accepted by Spark's option validation (failure
    // is again only the missing driver, not option rejection)
    val full = SourceConfig("JDBC", ConnectionDetails(
      jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t"),
      partitionColumn = Some("id"), numPartitions = Some(8),
      lowerBound = Some(0L), upperBound = Some(1000000L)))
    val e2 = intercept[java.sql.SQLException](Readers.jdbc(spark, full))
    assert(e2.getMessage.contains("No suitable driver"))
  }

  test("JDBC sink passes saveMode through unchanged") {
    // a bogus mode must be REJECTED by Spark's mode parser — the old
    // behavior silently coerced any non-overwrite mode to append
    val df = Seq((1, "a")).toDF("id", "v")
    val dest = graft.model.DestinationConfig("JDBC",
      ConnectionDetails(jdbcUrl = Some("jdbc:h2:mem:x"), tableName = Some("t")),
      saveMode = "bogus_mode")
    val e = intercept[org.apache.spark.sql.AnalysisException](
      graft.sinks.Writers.write(df, dest))
    assert(e.getMessage.toLowerCase.contains("mode"))
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
