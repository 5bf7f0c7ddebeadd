package graft.sources

import graft.model.{FieldMapping, SourceConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Source builders: config -> lazy DataFrame scan.
 *
 * Replaces the reference's explicit open/stream/close readers
 * (S1-S9, SURVEY.md §2.1) with Spark DataFrameReader declarations.
 * Projection and predicate pushdown — which the reference hand-builds
 * into a SELECT string (ETLCoreJdbcReader.java:131-162) — fall out of
 * Catalyst once the caller applies `MappingOp` on top of these scans:
 * `.explain` shows PushedFilters + pruned ReadSchema at the parquet/
 * JDBC source.
 */
object Readers {

  def forConfig(spark: SparkSession, cfg: SourceConfig, mappings: Seq[FieldMapping]): DataFrame = {
    val c = cfg.connectionDetails
    cfg.`type`.toUpperCase match {
      case "PARQUET" =>
        // mergeSchema: schema drift across load batches — the union
        // schema over every file's footer, NULLs where a file predates
        // a column. Opt-in (ConnectionDetails.mergeSchema): merging
        // reads all footers at planning time.
        c.mergeSchema.fold(spark.read)(m =>
          spark.read.option("mergeSchema", m.toString)).parquet(requirePath(cfg))
      case "ORC" =>
        // Columnar like parquet: pruning/pushdown/vectorized read all
        // apply; ORC's row-group (stripe) stats skip the same way.
        c.mergeSchema.fold(spark.read)(m =>
          spark.read.option("mergeSchema", m.toString)).orc(requirePath(cfg))
      case "CSV" | "FLAT_FILE" | "DELIMITED" =>
        // linesToSkip=1 usually MEANS "skip the header" (reference
        // convention) — but with an explicit includeHeader=false that
        // one line is a non-header preamble and must still be skipped.
        val headerVal = c.includeHeader.getOrElse(c.linesToSkip.contains(1))
        val skip = c.linesToSkip.getOrElse(0) match {
          case n if n > 1          => n
          case 1 if !headerVal     => 1
          case _                   => 0
        }
        csv(spark, requirePath(cfg), mappings,
          delimiter = c.delimiter.getOrElse(","),
          header = headerVal,
          encoding = c.encoding.getOrElse("UTF-8"),
          quote = c.quoteChar.getOrElse("\""),
          linesToSkip = skip)
      case "JSON" =>
        json(spark, requirePath(cfg), mappings)
      case "XML" =>
        // Spark 4 native XML source. Same declared-schema discipline
        // as JSON: no inference pass (unaffordable at 100 TB), strings
        // in, MappingOp casts downstream. rowTag from `tableName`
        // (the closest config analog) or the "row" default.
        val base = spark.read.option("rowTag", c.tableName.getOrElse("row"))
        (if (mappings.nonEmpty)
          base.schema(StructType(
            mappings.map(m => StructField(m.sourceFieldName, StringType, nullable = true))))
        else base).xml(requirePath(cfg))
      case "FIXED_WIDTH" | "FIXED_LENGTH_FILE" =>
        fixedWidth(spark, requirePath(cfg), mappings, c.encoding.getOrElse("UTF-8"))
      case "JDBC" | "ORACLE" | "MSSQL" | "SQLSERVER" =>
        jdbc(spark, cfg)
      case "REST_API" | "REST" =>
        // numPartitions opts into the PAGINATED data-plane scan (one
        // page per partition, executor-parallel); otherwise the
        // control-plane single fetch.
        if (c.numPartitions.exists(_ > 0) && mappings.nonEmpty)
          restPaged(spark, cfg, mappings)
        else rest(spark, cfg, restTransport)
      case other =>
        throw new IllegalArgumentException(s"unsupported source type: $other")
    }
  }

  /** Pluggable REST transport: url -> response body. Swapped for a
    * fake in tests; a real deployment injects an HTTP client. The
    * reference declared REST_API as a source type but never
    * implemented it (etlModel.java:182-190, TODO at
    * ItemReaderFactory.java:95-97). */
  @volatile var restTransport: String => String = { url =>
    val conn = new java.net.URL(url).openConnection()
    conn.setConnectTimeout(10000); conn.setReadTimeout(30000)
    val in = conn.getInputStream
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /**
   * REST source: the driver fetches a JSON(-lines) payload once, then
   * parallelizes it into a DataFrame with inferred schema. This is a
   * CONTROL-plane fetch (config-sized payloads — the reference's
   * REST sources feed job parameters, not bulk data); bulk data over
   * HTTP would need a partitioned DataSource V2, out of scope like
   * the reference's own TODO.
   */
  def rest(spark: SparkSession, cfg: SourceConfig,
           transport: String => String): DataFrame = {
    val url = cfg.connectionDetails.jdbcUrl.orElse(cfg.connectionDetails.pathOrFile)
      .getOrElse(throw new IllegalArgumentException("REST source requires a url (in path or jdbcUrl)"))
    val body = transport(url)
    import spark.implicits._
    spark.read.json(body.linesIterator.filter(_.trim.nonEmpty).toSeq.toDS())
  }

  /** Paginated REST scan via the DataSource V2 connector
    * (RestDataSource): `numPartitions` pages fetched in parallel on
    * executors, declared all-string schema from the mapping source
    * names, column pruning at the source. The url should contain a
    * `{page}` placeholder. */
  def restPaged(spark: SparkSession, cfg: SourceConfig, mappings: Seq[FieldMapping]): DataFrame = {
    val c = cfg.connectionDetails
    val url = c.jdbcUrl.orElse(c.pathOrFile).getOrElse(
      throw new IllegalArgumentException("REST source requires a url (in path or jdbcUrl)"))
    // without the placeholder every partition would fetch the SAME
    // payload and silently multiply rows numPartitions times
    require(url.contains("{page}"),
      s"paginated REST url must contain a {page} placeholder (got: $url); " +
        "drop numPartitions for a single-fetch read")
    spark.read.format(classOf[RestDataSource].getName)
      .option("url", url)
      .option("pages", c.numPartitions.getOrElse(1).toString)
      .option("fields", mappings.map(_.sourceFieldName).mkString(","))
      .load()
  }

  /**
   * CSV scan (reference S5/S6, ItemReaderFactory.java:170-224):
   * all values land as strings (mirroring the tokenizer — casts happen
   * in the mapping stage); headerless files get positional names from
   * mapping order (ItemReaderFactory.java:205-210); quoted fields are
   * honored (`readString`, ItemReaderFactory.java:218).
   */
  def csv(spark: SparkSession, path: String, mappings: Seq[FieldMapping],
          delimiter: String = ",", header: Boolean = true,
          encoding: String = "UTF-8", quote: String = "\"",
          linesToSkip: Int = 0): DataFrame = {
    val base = spark.read
      .option("delimiter", delimiter)
      .option("encoding", encoding)
      .option("quote", quote)
      .option("escape", "\"") // RFC-4180 doubled-quote escaping (ETLCoreCsvFileWriter.java:174-185)
      .option("multiLine", "true") // values may span newlines when quoted
      .option("header", header.toString)
    val schema = StructType(mappings.map(m => StructField(m.sourceFieldName, StringType, nullable = true)))
    if (linesToSkip > 0) {
      // Reference `linesToSkip` (preamble lines before data,
      // ItemReaderFactory.java:202): Spark's CSV reader only knows
      // header=1 line, so drop the preamble per FILE (wholetext keeps
      // each file one record — correct line ordering by construction),
      // then parse the remainder as CSV. A file with BOTH a preamble
      // and a header row (includeHeader=true) keeps header parsing on
      // the remainder — and binds columns BY HEADER NAME (declaring
      // the positional schema together with header=true would bind
      // mapping order to file order positionally and silently swap
      // columns). MEMORY BOUND: wholetext materializes each file as
      // one record, so a single file must fit in executor memory —
      // preamble-style feeds are config-sized; route bulk data through
      // the plain CSV path (no preamble), which streams.
      import spark.implicits._
      val lines = spark.read.option("wholetext", "true").option("encoding", encoding)
        .text(path).as[String]
        .flatMap(_.linesIterator.drop(linesToSkip))
      val r = spark.read
        .option("delimiter", delimiter).option("quote", quote).option("escape", "\"")
        .option("header", header.toString)
      if (mappings.nonEmpty && !header) r.schema(schema).csv(lines) else r.csv(lines)
    } else if (header) base.csv(path)
    else {
      // Positional columns named from the mapping order.
      if (mappings.nonEmpty) base.schema(schema).csv(path) else base.csv(path)
    }
  }

  /** JSON scan. With mappings declared, the schema is DECLARED
    * (all-string fields, casts in the mapping stage) — schema
    * inference is a full extra pass over the data, unaffordable at
    * 100 TB; inference only happens for mapping-less exploratory
    * reads. */
  def json(spark: SparkSession, path: String, mappings: Seq[FieldMapping]): DataFrame =
    if (mappings.nonEmpty)
      spark.read.schema(StructType(
        mappings.map(m => StructField(m.sourceFieldName, StringType, nullable = true)))).json(path)
    else spark.read.json(path)

  /**
   * Fixed-width file scan (reference S8, declared-unimplemented:
   * etlModel.java:96-97,182-190), via the DataSource V2 connector
   * (FixedWidthDataSource): column pruning happens at the source —
   * only the byte slices the plan needs are decoded. Field layout
   * comes from (fileColumnPosition, fileColumnWidth) on the mappings,
   * 1-based start offsets. A column whose start lies past the end of a
   * short line is NULL (feeding ErrorPolicy), not empty string — the
   * one deliberate difference from a substring-over-text formulation.
   */
  def fixedWidth(spark: SparkSession, path: String, mappings: Seq[FieldMapping],
                 encoding: String = "UTF-8"): DataFrame = {
    val fields = mappings.map { m =>
      require(!m.sourceFieldName.exists(c => c == ':' || c == ','),
        s"fixed-width field name '${m.sourceFieldName}' may not contain ':' or ','")
      val start = m.fileColumnPosition.getOrElse(
        throw new IllegalArgumentException(s"fixed-width mapping ${m.sourceFieldName} missing fileColumnPosition"))
      val width = m.fileColumnWidth.getOrElse(
        throw new IllegalArgumentException(s"fixed-width mapping ${m.sourceFieldName} missing fileColumnWidth"))
      s"${m.sourceFieldName}:$start:$width"
    }
    spark.read.format(classOf[FixedWidthDataSource].getName)
      .option("path", path)
      .option("fields", fields.mkString(","))
      .option("encoding", encoding)
      .load()
  }

  /**
   * JDBC scan (reference S1-S4). Partitioned read replaces the docx
   * §4 paging reader: `partitionColumn`+`numPartitions` split the scan
   * across executors — at 100 TB this is the difference between one
   * cursor and a thousand. `fetchsize` preserves the reference's
   * streaming-cursor knob (ETLCoreJdbcReader.java:77-83).
   * Credentials come via env-var indirection, never config literals.
   */
  /** Pin Derby's embedded home (derby.log, lock bookkeeping) outside
    * the working directory — shared by every embedded-Derby path
    * (gate query, specs) so log/lock state never splits across homes.
    * Idempotent; no-op when a home is already set. */
  def ensureDerbyHome(dir: String = "/tmp/graft_derby_home"): Unit =
    if (System.getProperty("derby.system.home") == null) {
      new java.io.File(dir).mkdirs()
      System.setProperty("derby.system.home", dir)
    }

  def jdbc(spark: SparkSession, cfg: SourceConfig): DataFrame = {
    val c = cfg.connectionDetails
    val url = c.jdbcUrl.getOrElse(throw new IllegalArgumentException("JDBC source requires jdbcUrl"))
    var r = spark.read.format("jdbc").option("url", url)
    c.query match {
      case Some(q) => r = r.option("query", q) // raw passthrough (ETLCoreJdbcReader.java:133-135)
      case None =>
        val t = c.tableName.getOrElse(throw new IllegalArgumentException("JDBC source requires tableName or query"))
        r = r.option("dbtable", sanitizeIdent(t))
    }
    c.username.foreach(u => r = r.option("user", u))
    resolvePassword(c).foreach(p => r = r.option("password", p))
    r = r.option("fetchsize", c.fetchSize.getOrElse(1000).toString)
    // Spark's JDBCOptions requires the full stride spec together:
    // partitionColumn + numPartitions + lowerBound + upperBound.
    // Anything less falls back to a single-partition scan (with a
    // warning) instead of failing at load().
    (c.partitionColumn, c.numPartitions, c.lowerBound, c.upperBound) match {
      case (Some(pc), Some(n), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", pc).option("numPartitions", n.toString)
          .option("lowerBound", lo.toString).option("upperBound", hi.toString)
      case (Some(pc), _, _, _) =>
        System.err.println(s"[graft] JDBC partitionColumn=$pc ignored: parallel scan needs " +
          "numPartitions + lowerBound + upperBound too; reading single-partition")
      case _ => ()
    }
    r.load()
  }

  /**
   * Kafka source option map (reference declares KAFKA as a source
   * type, etlModel.java:189, with kafka deps in etlcorepom.xml, but
   * never implements a data-plane reader; its Kafka use is the
   * control-plane trigger, covered by graft.job.JobQueue). No kafka
   * connector jar ships in this environment, so the honest surface is
   * the option contract: `spark.readStream.format("kafka")
   * .options(kafkaOptions(cfg))` is the wiring a deployment with
   * spark-sql-kafka on the classpath would use.
   */
  def kafkaOptions(cfg: SourceConfig): Map[String, String] = {
    val c = cfg.connectionDetails
    val brokers = c.bootstrapServers.getOrElse(
      throw new IllegalArgumentException("KAFKA source requires bootstrapServers"))
    val topic = c.topic.getOrElse(
      throw new IllegalArgumentException("KAFKA source requires topic"))
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> c.startingOffsets.getOrElse("earliest"),
      // bound per-trigger read pressure; maps the reference's
      // chunked-consumption knob onto the structured source
      "maxOffsetsPerTrigger" -> c.fetchSize.getOrElse(10000).toString,
      "failOnDataLoss" -> "false"
    )
  }

  /**
   * MongoDB source option map (reference declares MONGODB,
   * etlModel.java:198-204, CoreLibInterfaces.java:436, with no
   * data-plane implementation). The mongo-spark connector jar is not
   * on this classpath; the contract is the option surface a deployment
   * would hand to `spark.read.format("mongodb").options(...)`.
   * Credentials ride the connection.uri via env indirection like JDBC.
   */
  def mongoOptions(cfg: SourceConfig): Map[String, String] = {
    val c = cfg.connectionDetails
    val uri = c.jdbcUrl.getOrElse(
      throw new IllegalArgumentException("MONGODB source requires a connection uri (in jdbcUrl)"))
    val coll = c.tableName.getOrElse(
      throw new IllegalArgumentException("MONGODB source requires a collection (in tableName)"))
    // uri path carries the database (mongodb://host/db[?opts]) — parse
    // the PATH component so a missing db or query params can't
    // masquerade as a database name
    val db = Option(java.net.URI.create(uri).getPath)
      .map(_.stripPrefix("/")).filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException("MONGODB uri must name a database: mongodb://host/db"))
    val base = Map(
      "connection.uri" -> uri,
      "database" -> db,
      "collection" -> coll)
    c.filter match {
      case Some(p) => base + ("aggregation.pipeline" -> s"""[{"$$match": ${predicateToMongoMatch(p)}}]""")
      case None    => base
    }
  }

  /** Minimal predicate -> $match translation for equality filters
    * ("col = 'v'"); anything richer passes through Spark's own V2
    * pushdown once a real connector is on the classpath. The value is
    * JSON-escaped — quotes/backslashes must not break the pipeline
    * document or inject operators. */
  private def predicateToMongoMatch(p: String): String = {
    val eq = """\s*([A-Za-z0-9_.]+)\s*=\s*'([^']*)'\s*""".r
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    p match {
      case eq(k, v) => s"""{"$k": "${esc(v)}"}"""
      case _        => throw new IllegalArgumentException(
        s"only simple equality filters translate to $$match (got: $p)")
    }
  }

  /** Identifier sanitation as in the reference (`[^a-zA-Z0-9_.]`,
    * ItemWriterFactory.java:135, TruncateTasklet.java:89). Shared by
    * sources, sinks, and the TRUNCATE step — one copy of a
    * security-relevant regex. */
  def sanitizeIdent(name: String): String = name.replaceAll("[^a-zA-Z0-9_.]", "")

  /** Env-var password indirection, FAIL-FAST: a configured-but-unset
    * variable is a deployment error — proceeding without a password
    * would surface as an opaque auth failure (or quietly use a default
    * credential). No passwordEnv at all = unauthenticated by intent. */
  def resolvePassword(c: graft.model.ConnectionDetails): Option[String] =
    c.passwordEnv.map { name =>
      sys.env.getOrElse(name, throw new IllegalArgumentException(
        s"passwordEnv names environment variable '$name', which is not set"))
    }

  private def requirePath(cfg: SourceConfig): String =
    cfg.connectionDetails.pathOrFile.getOrElse(
      throw new IllegalArgumentException(s"${cfg.`type`} source requires a path"))
}
