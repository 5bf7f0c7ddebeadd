package graft.model

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/**
 * Job-configuration model for the graft ETL/analytics engine.
 *
 * Mirrors the JSON shape of the reference engine's job config
 * (reference: jobconfigex.json:1-49, CoreLibInterfaces.java:56-109,
 * etlModel.java:13-174) while staying a plain Scala case-class tree.
 * A job names one source, one destination, a list of field mappings
 * (rename + cast + nullability + default + transformation rule), an
 * error-handling policy, and an ordered list of orchestration steps.
 *
 * Parsing is lenient: unknown keys are ignored, and both naming
 * dialects seen in the reference are accepted
 * (`destinationFieldName`/`destFieldName`, `filter`/`whereClause`).
 */
final case class ConnectionDetails(
    path: Option[String] = None,          // parquet/csv/json/fixed-width file or dir
    filePath: Option[String] = None,      // reference name for file sinks (ETLCoreCsvFileWriter.java:52)
    jdbcUrl: Option[String] = None,
    username: Option[String] = None,
    passwordEnv: Option[String] = None,   // env-var indirection, never inline secrets
    tableName: Option[String] = None,
    query: Option[String] = None,         // raw SQL passthrough (ETLCoreJdbcReader.java:133-135)
    filter: Option[String] = None,        // pushed-down predicate string (jobconfigex.json:10)
    fetchSize: Option[Int] = None,
    partitionColumn: Option[String] = None, // parallel JDBC scan (docx §4 paging analog)
    numPartitions: Option[Int] = None,
    lowerBound: Option[Long] = None,        // required with partitionColumn (Spark JDBCOptions
    upperBound: Option[Long] = None,        // needs all four stride inputs together)
    delimiter: Option[String] = None,
    encoding: Option[String] = None,
    includeHeader: Option[Boolean] = None,
    linesToSkip: Option[Int] = None,
    quoteChar: Option[String] = None,
    bootstrapServers: Option[String] = None, // Kafka source (reference declares KAFKA,
    topic: Option[String] = None,            // etlModel.java:189; jar not shipped here —
    startingOffsets: Option[String] = None,  // see Readers.kafkaOptions)
    partitionKeys: List[String] = Nil,       // hive-layout file-sink partitioning
    sortKeys: List[String] = Nil,            // sort-within-partitions before write
    maxRecordsPerFile: Option[Long] = None,  // bound output file size
    // JDBC sink DDL override, e.g. "status VARCHAR(1), note VARCHAR(64)".
    // Some dialects map StringType to a LOB by default (Derby: CLOB),
    // which then cannot be compared/indexed server-side.
    createTableColumnTypes: Option[String] = None,
    // File-sink codec (snappy/zstd/gzip/lz4/none...). At 100 TB the
    // codec choice IS a capacity decision — zstd halves parquet
    // footprint vs snappy at similar scan speed; defaults stay
    // Spark's when unset.
    compression: Option[String] = None,
    // Parquet/ORC source: union the schemas of all files in the dir
    // (schema drift across load batches — new columns read as NULL in
    // older files). Off by default: merging reads every footer at
    // planning time, a real cost on a 100k-file directory.
    mergeSchema: Option[Boolean] = None
) {
  def pathOrFile: Option[String] = path.orElse(filePath)
}

final case class SourceConfig(
    `type`: String, // PARQUET | CSV | JSON | FIXED_WIDTH | JDBC | ORACLE | MSSQL
    connectionDetails: ConnectionDetails = ConnectionDetails()
)

final case class DestinationConfig(
    `type`: String, // PARQUET | FLAT_FILE | CSV | JSON | JDBC
    connectionDetails: ConnectionDetails = ConnectionDetails(),
    batchSize: Int = 1000, // reference default (CoreLibInterfaces.java:78)
    saveMode: String = "overwrite"
)

/**
 * One field mapping: source column -> destination column with a
 * declared destination type, nullability, optional default value,
 * optional named transformation rule (UPPERCASE/TRIM/...), optional
 * format pattern for date/number parsing.
 * (reference: CoreLibInterfaces.java:82-89, etlModel.java:86-158)
 */
final case class FieldMapping(
    sourceFieldName: String,
    destinationFieldName: String,
    sourceFieldType: String = "STRING",
    destFieldType: String = "STRING",
    isSourceNullable: Boolean = true,
    isDestNullable: Boolean = true,
    defaultValue: Option[String] = None,
    transformationRule: Option[String] = None,
    formatPattern: Option[String] = None,
    fileColumnPosition: Option[Int] = None, // fixed-width start (etlModel.java:96-97)
    fileColumnWidth: Option[Int] = None
)

/** Error strategy (reference: CoreLibInterfaces.java:91-96). */
final case class ErrorHandling(
    strategy: String = "FAIL_JOB", // FAIL_JOB | LOG_ONLY | ROUTE_TO_FILE
    errorFilePath: Option[String] = None,
    maxErrorsAllowed: Long = 0L
)

final case class Transformation(
    `type`: String = "NONE", // NONE | PLUGIN (reference PYTHON_SCRIPT -> pluggable DataFrame=>DataFrame)
    name: Option[String] = None,
    parameters: Map[String, String] = Map.empty
)

final case class Monitoring(progressUpdateFrequency: Long = 10000L)

final case class JobConfig(
    jobId: String,
    jobName: Option[String] = None,
    source: SourceConfig,
    destination: Option[DestinationConfig] = None,
    mappings: List[FieldMapping] = Nil,
    errorHandling: ErrorHandling = ErrorHandling(),
    transformation: Transformation = Transformation(),
    monitoring: Monitoring = Monitoring(),
    // Ordered orchestration steps (etlModel.java:166-174). Empty = just LOAD.
    steps: List[String] = Nil
)

object JobConfig {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Parse a job-config JSON document (tolerates unknown keys and the
    * reference's field-name variants). */
  def fromJson(json: String): JobConfig = {
    val root = mapper.readTree(json)
    parseRoot(root)
  }

  def fromFile(path: String): JobConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def optText(n: JsonNode, names: String*): Option[String] =
    names.iterator.map(n.get).collectFirst { case v if v != null && !v.isNull => v.asText }
  private def optInt(n: JsonNode, names: String*): Option[Int] =
    names.iterator.map(n.get).collectFirst { case v if v != null && !v.isNull => v.asInt }
  private def optBool(n: JsonNode, names: String*): Option[Boolean] =
    names.iterator.map(n.get).collectFirst { case v if v != null && !v.isNull => v.asBoolean }
  // asLong, not asInt: values past Int range (billions of allowed
  // errors) would wrap/truncate through Jackson's int conversion
  private def optLong(n: JsonNode, names: String*): Option[Long] =
    names.iterator.map(n.get).collectFirst { case v if v != null && !v.isNull => v.asLong }
  // accepts ["a","b"] or "a,b" — config authors write both shapes
  private def strList(n: JsonNode, names: String*): List[String] =
    names.iterator.map(n.get).collectFirst {
      case v if v != null && v.isArray =>
        // same trim/drop-empty normalization as the string shape
        (0 until v.size).map(v.get(_).asText.trim).filter(_.nonEmpty).toList
      case v if v != null && !v.isNull =>
        v.asText.split(",").map(_.trim).filter(_.nonEmpty).toList
    }.getOrElse(Nil)

  private def parseConn(n: JsonNode): ConnectionDetails =
    if (n == null || n.isNull) ConnectionDetails()
    else ConnectionDetails(
      path = optText(n, "path", "directory"),
      filePath = optText(n, "filePath", "fileName"),
      jdbcUrl = optText(n, "jdbcUrl", "url"),
      username = optText(n, "username", "user"),
      passwordEnv = optText(n, "passwordEnv", "passwordEnvVar"),
      tableName = optText(n, "tableName", "table"),
      query = optText(n, "query", "sql"),
      filter = optText(n, "filter", "whereClause", "sourceFilter"),
      fetchSize = optInt(n, "fetchSize"),
      partitionColumn = optText(n, "partitionColumn", "sortKey"),
      numPartitions = optInt(n, "numPartitions"),
      lowerBound = optText(n, "lowerBound").map(_.toLong),
      upperBound = optText(n, "upperBound").map(_.toLong),
      delimiter = optText(n, "delimiter"),
      encoding = optText(n, "encoding"),
      includeHeader = optBool(n, "includeHeader", "header"),
      linesToSkip = optInt(n, "linesToSkip"),
      quoteChar = optText(n, "quoteChar", "quote"),
      bootstrapServers = optText(n, "bootstrapServers", "brokers"),
      topic = optText(n, "topic", "topicName"),
      startingOffsets = optText(n, "startingOffsets"),
      partitionKeys = strList(n, "partitionKeys", "partitionBy"),
      sortKeys = strList(n, "sortKeys", "sortBy"),
      maxRecordsPerFile = optLong(n, "maxRecordsPerFile"),
      createTableColumnTypes = optText(n, "createTableColumnTypes"),
      compression = optText(n, "compression", "codec"),
      mergeSchema = optBool(n, "mergeSchema")
    )

  private def parseMapping(n: JsonNode): FieldMapping = {
    val srcName = optText(n, "sourceFieldName", "sourceField").getOrElse(
      throw new IllegalArgumentException(s"mapping missing sourceFieldName: $n"))
    FieldMapping(
      sourceFieldName = srcName,
      destinationFieldName = optText(n, "destinationFieldName", "destFieldName", "destinationField")
        .getOrElse(srcName), // default to the source name in EITHER dialect
      sourceFieldType = optText(n, "sourceFieldType", "sourceSqlType").getOrElse("STRING"),
      destFieldType = optText(n, "destFieldType", "destSqlType", "destinationFieldType").getOrElse("STRING"),
      isSourceNullable = optBool(n, "isSourceNullable", "sourceIsNullAllowed").getOrElse(true),
      isDestNullable = optBool(n, "isDestNullable", "destIsNullAllowed", "isDestinationNullable").getOrElse(true),
      defaultValue = optText(n, "defaultValue"),
      transformationRule = optText(n, "transformationRule"),
      formatPattern = optText(n, "formatPattern"),
      fileColumnPosition = optInt(n, "fileColumnPosition"),
      fileColumnWidth = optInt(n, "fileColumnWidth")
    )
  }

  private def parseRoot(root: JsonNode): JobConfig = {
    val src = Option(root.get("source")).filterNot(_.isNull).getOrElse(
      throw new IllegalArgumentException("job config missing 'source'"))
    val mappings = Option(root.get("mappings")).filterNot(_.isNull)
      .map(_.elements().asScala.map(parseMapping).toList).getOrElse(Nil)
    val dest = Option(root.get("destination")).filterNot(_.isNull).map { d =>
      DestinationConfig(
        `type` = optText(d, "type").getOrElse("PARQUET"),
        connectionDetails = parseConn(d.get("connectionDetails")),
        batchSize = optInt(d, "batchSize").getOrElse(1000),
        saveMode = optText(d, "saveMode", "mode").getOrElse("overwrite")
      )
    }
    val eh = Option(root.get("errorHandling")).filterNot(_.isNull).map { e =>
      ErrorHandling(
        strategy = optText(e, "strategy").getOrElse("FAIL_JOB"),
        errorFilePath = optText(e, "errorFilePath"),
        maxErrorsAllowed = optLong(e, "maxErrorsAllowed").getOrElse(0L)
      )
    }.getOrElse(ErrorHandling())
    val tr = Option(root.get("transformation")).filterNot(_.isNull).map { t =>
      Transformation(
        `type` = optText(t, "type").getOrElse("NONE"),
        name = optText(t, "name", "scriptPath"),
        parameters = Option(t.get("parameters")).filterNot(_.isNull)
          .map(p => p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
          .getOrElse(Map.empty)
      )
    }.getOrElse(Transformation())
    val mon = Option(root.get("monitoring")).filterNot(_.isNull)
      .map(m => Monitoring(optLong(m, "progressUpdateFrequency").getOrElse(10000L)))
      .getOrElse(Monitoring())
    val steps = Option(root.get("steps")).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText).toList).getOrElse(Nil)
    JobConfig(
      jobId = optText(root, "jobId", "taskId").getOrElse(java.util.UUID.randomUUID().toString.take(8)),
      jobName = optText(root, "jobName"),
      source = SourceConfig(
        `type` = optText(src, "type").getOrElse("PARQUET"),
        connectionDetails = parseConn(src.get("connectionDetails"))
      ),
      destination = dest,
      mappings = mappings,
      errorHandling = eh,
      transformation = tr,
      monitoring = mon,
      steps = steps
    )
  }
}
