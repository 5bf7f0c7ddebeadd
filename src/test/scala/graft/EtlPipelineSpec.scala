package graft

import graft.model._
import graft.job.JobRunner
import graft.operators.{ErrorPolicy, MappingOp}
import graft.sources.Readers
import graft.sinks.Writers
import org.apache.spark.sql.functions._

/** CSV round-trip (W3/S5 semantics), error policies (E1/E2),
  * fixed-width source (S8), job orchestration (O1-O4, O15). */
object EtlPipelineSpec {
  // static so executor threads (same JVM in local mode) can record
  val restCapture = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[String])]()
}

class EtlPipelineSpec extends SparkTestBase {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  // ---------- CSV writer/reader round trip (FIXTURES.md §3) ----------
  test("CSV round-trip: quoting, embedded newlines, null as empty string") {
    val out = tmpDir("csvrt")
    val df = Seq(
      (1L, "Smith, John", "said \"hi\""),
      (2L, "Plain", null),
      (3L, "multi\nline", "ok")
    ).toDF("id", "name", "comment")
    Writers.write(df, DestinationConfig("CSV",
      ConnectionDetails(path = Some(s"$out/data"), includeHeader = Some(true))))
    val mappings = List(
      FieldMapping("id", "id"), FieldMapping("name", "name"), FieldMapping("comment", "comment"))
    val back = Readers.csv(spark, s"$out/data", mappings, header = true)
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "Smith, John")
    assert(back(0).getString(2) == "said \"hi\"")
    assert(back(1).getString(2) == null) // null -> "" -> null
    assert(back(2).getString(1) == "multi\nline")
  }

  test("headerless CSV gets positional names from mapping order") {
    val out = tmpDir("csvpos")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/f.csv"), "1,alpha\n2,beta\n")
    val mappings = List(FieldMapping("id", "id"), FieldMapping("label", "label"))
    val df = Readers.csv(spark, s"$out/f.csv", mappings, header = false)
    assert(df.columns.toSeq == Seq("id", "label"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("alpha", "beta"))
  }

  test("linesToSkip > 1 drops the preamble before CSV parsing") {
    val out = tmpDir("skipcsv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/f.csv"),
      "report generated 2026-08-12\nsource: mainframe\n1,alpha\n2,beta\n")
    val mappings = List(FieldMapping("id", "id"), FieldMapping("label", "label"))
    val df = Readers.csv(spark, s"$out/f.csv", mappings, header = false, linesToSkip = 2)
    assert(df.orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "alpha"), ("2", "beta")))
  }

  test("JSON source with mappings uses a declared schema (no inference pass)") {
    val out = tmpDir("jsonsrc")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/d.json"),
      """{"a": 1, "b": "x", "ignored": true}
        |{"a": 2, "b": "y", "ignored": false}""".stripMargin)
    val mappings = List(FieldMapping("a", "a", destFieldType = "LONG"), FieldMapping("b", "b"))
    val raw = Readers.json(spark, s"$out/d.json", mappings)
    assert(raw.schema.fieldNames.toSeq == Seq("a", "b")) // declared, pruned
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))
    val mapped = MappingOp(raw, mappings).orderBy("a").collect()
    assert(mapped.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("CAPITALIZE and NORMALIZE_WS transformation rules") {
    val df = Seq(("hello   spark  world", "mIxEd case")).toDF("a", "b")
    val mappings = List(
      FieldMapping("a", "a_n", transformationRule = Some("NORMALIZE_WS")),
      FieldMapping("b", "b_c", transformationRule = Some("CAPITALIZE")))
    val r = MappingOp(df, mappings).collect()(0)
    assert(r.getString(0) == "hello spark world")
    assert(r.getString(1) == "Mixed Case")
  }

  // ---------- fixed-width source ----------
  test("fixed-width file slices by position/width and trims") {
    val out = tmpDir("fw")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/fw.txt"), "001alpha     42\n002beta      17\n")
    val mappings = List(
      FieldMapping("id", "id", destFieldType = "INTEGER", fileColumnPosition = Some(1), fileColumnWidth = Some(3)),
      FieldMapping("name", "name", fileColumnPosition = Some(4), fileColumnWidth = Some(10)),
      FieldMapping("qty", "qty", destFieldType = "INTEGER", fileColumnPosition = Some(14), fileColumnWidth = Some(2)))
    val df = MappingOp(Readers.fixedWidth(spark, s"$out/fw.txt", mappings), mappings)
    val rows = df.orderBy("id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "alpha", 42), (2, "beta", 17)))
  }

  test("REST sink posts JSON-line batches through the pluggable transport") {
    val orig = Writers.restTransport
    EtlPipelineSpec.restCapture.clear()
    Writers.restTransport = (url, batch) => EtlPipelineSpec.restCapture.add(url -> batch)
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(1)
      Writers.write(df, DestinationConfig("REST_API",
        ConnectionDetails(jdbcUrl = Some("https://example.invalid/ingest")), batchSize = 2))
      val batches = EtlPipelineSpec.restCapture.asScala.toSeq
      assert(batches.map(_._2.size).sorted == Seq(1, 2)) // 3 rows, batchSize 2
      assert(batches.forall(_._1 == "https://example.invalid/ingest"))
      val all = batches.flatMap(_._2).sorted
      assert(all.exists(_.contains("\"id\":1")) && all.size == 3)
    } finally Writers.restTransport = orig
  }

  // ---------- error policies ----------
  private def badDf = Seq(("1", "12.50"), ("2", "not_a_number"), ("3", "8.00"))
    .toDF("id", "amount")
  private val badMappings = List(
    FieldMapping("id", "id", destFieldType = "LONG", isDestNullable = false),
    FieldMapping("amount", "amount", destFieldType = "DECIMAL(10,2)", isDestNullable = false))

  test("FAIL_JOB aborts on first bad row") {
    val mapped = MappingOp(badDf, badMappings)
    intercept[ErrorPolicy.JobFailedException] {
      ErrorPolicy.enforce(mapped, badMappings, ErrorHandling("FAIL_JOB"))
    }
  }

  test("LOG_ONLY drops and counts bad rows") {
    val (good, n) = ErrorPolicy.enforce(MappingOp(badDf, badMappings), badMappings, ErrorHandling("LOG_ONLY"))
    assert(n == 1)
    assert(good.count() == 2)
  }

  test("ROUTE_TO_FILE writes the rejected rows") {
    val out = tmpDir("errs")
    val (good, n) = ErrorPolicy.enforce(MappingOp(badDf, badMappings), badMappings,
      ErrorHandling("ROUTE_TO_FILE", errorFilePath = Some(s"$out/bad")))
    assert(n == 1 && good.count() == 2)
    val bad = spark.read.option("header", "true").csv(s"$out/bad").collect()
    assert(bad.length == 1 && bad(0).getString(0) == "2")
  }

  test("maxErrorsAllowed boundary: n == max passes, n > max fails") {
    val mapped = MappingOp(badDf, badMappings)
    val (_, n1) = ErrorPolicy.enforce(mapped, badMappings,
      ErrorHandling("LOG_ONLY", maxErrorsAllowed = 1))
    assert(n1 == 1) // exactly at the cap: allowed
    intercept[ErrorPolicy.JobFailedException] {
      val threeBad = Seq(("x", "a"), ("y", "b"), ("3", "1.0")).toDF("id", "amount")
      ErrorPolicy.enforce(MappingOp(threeBad, badMappings), badMappings,
        ErrorHandling("LOG_ONLY", maxErrorsAllowed = 1))
    }
  }

  // ---------- job orchestration ----------
  test("full job: steps run in order, counts recorded, VALIDATE_LOAD checks round-trip") {
    val out = tmpDir("job")
    val cfg = JobConfig(
      jobId = "t1",
      source = SourceConfig("PARQUET", ConnectionDetails(
        path = Some(s"$sf/orders.parquet"), filter = Some("o_orderstatus = 'F'"))),
      destination = Some(DestinationConfig("PARQUET",
        ConnectionDetails(path = Some(s"$out/dest")))),
      mappings = List(
        FieldMapping("o_orderkey", "id", destFieldType = "LONG", isDestNullable = false),
        FieldMapping("o_totalprice", "total", destFieldType = "DECIMAL(18,2)")),
      steps = List("VALIDATE_SOURCE", "LOAD", "VALIDATE_LOAD", "NOTIFY_SUCCESS"))
    val res = JobRunner.run(spark, cfg)
    assert(res.status == JobRunner.Completed, res.message)
    assert(res.recordsWritten > 0)
    assert(res.stepsRun == List("VALIDATE_SOURCE", "LOAD", "VALIDATE_LOAD", "NOTIFY_SUCCESS"))
    assert(spark.read.parquet(s"$out/dest").count() == res.recordsWritten)
  }

  test("VALIDATE_QUALITY step: passing rules load; failing rule fails with metrics") {
    val out = tmpDir("job_q")
    def cfg(rules: String, dest: String) = JobConfig(
      jobId = s"tq-$dest",
      source = SourceConfig("PARQUET", ConnectionDetails(path = Some(s"$sf/customer.parquet"))),
      destination = Some(DestinationConfig("PARQUET",
        ConnectionDetails(path = Some(s"$out/$dest")))),
      mappings = List(
        FieldMapping("c_custkey", "id", destFieldType = "LONG", isDestNullable = false),
        FieldMapping("c_mktsegment", "segment", destFieldType = "STRING")),
      transformation = Transformation(parameters = Map("qualityRules" -> rules)),
      steps = List("VALIDATE_QUALITY", "LOAD"))
    val ok = JobRunner.run(spark, cfg(
      "not_null:c_custkey; unique:c_custkey; regex:c_mktsegment,1.0,^[A-Z]+$; row_count:1,10000000",
      "ok"))
    assert(ok.status == JobRunner.Completed, ok.message)
    assert(ok.stepsRun == List("VALIDATE_QUALITY", "LOAD"))
    val bad = JobRunner.run(spark, cfg("unique:c_mktsegment; row_count:1,10000000", "bad"))
    assert(bad.status.isInstanceOf[JobRunner.Failed], bad.status.toString)
    assert(bad.message.contains("VALIDATE_QUALITY") && bad.message.contains("unique(c_mktsegment)"),
      bad.message)
    assert(!new java.io.File(s"$out/bad").exists, "failed gate must not load")
  }

  test("PROFILE_SOURCE step writes the column survey next to the destination") {
    val out = tmpDir("job_prof")
    val cfg = JobConfig(
      jobId = "tprof",
      source = SourceConfig("PARQUET", ConnectionDetails(path = Some(s"$sf/customer.parquet"))),
      destination = Some(DestinationConfig("PARQUET",
        ConnectionDetails(path = Some(s"$out/dest")))),
      mappings = List(
        FieldMapping("c_custkey", "id", destFieldType = "LONG", isDestNullable = false),
        FieldMapping("c_acctbal", "balance", destFieldType = "DOUBLE"),
        FieldMapping("c_mktsegment", "segment", destFieldType = "STRING")),
      steps = List("PROFILE_SOURCE", "LOAD"))
    val res = JobRunner.run(spark, cfg)
    assert(res.status == JobRunner.Completed, res.message)
    assert(res.stepsRun.head == "PROFILE_SOURCE")
    val prof = spark.read.parquet(s"$out/dest_profile")
    val rows = prof.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("c_custkey", "c_acctbal", "c_mktsegment"),
      s"profile must cover exactly the mapped source columns, got ${rows.keySet}")
    val n = Tables.t(spark, sf, "customer").count()
    assert(rows.values.forall(_ == n), "n_rows must equal the source row count")
  }

  test("upsert: version ties resolve to the update side; applyBatch agrees when updates are newer") {
    val existing = Seq((1L, "old", 5L), (2L, "keep", 5L)).toDF("k", "v", "ver")
    val updates = Seq((1L, "new", 5L)).toDF("k", "v", "ver") // SAME version
    val merged = graft.operators.Upsert.keepLatest(existing, updates, Seq("k"), "ver")
      .orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "new"), (2L, "keep")))
    // anti-join form equals keepLatest when every update is newer
    val newer = Seq((1L, "new2", 9L)).toDF("k", "v", "ver")
    val a = graft.operators.Upsert.keepLatest(existing, newer, Seq("k"), "ver")
    val b = graft.operators.Upsert.applyBatch(existing, newer, Seq("k"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("snapshotDiff classifies null-safely: null keys pair up, null values compare equal") {
    val o = Seq((Option(1L), Option("a")), (Option.empty[Long], Option("x")),
      (Option(2L), Option.empty[String]), (Option(3L), Option("c"))).toDF("k", "v")
    val n = Seq((Option(1L), Option("a2")), (Option.empty[Long], Option("x")),
      (Option(2L), Option.empty[String]), (Option(4L), Option("d"))).toDF("k", "v")
    val got = graft.operators.Upsert.snapshotDiff(o, n, Seq("k")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(got == Map(1L -> "UPDATE", -1L -> "UNCHANGED", 2L -> "UNCHANGED",
      3L -> "DELETE", 4L -> "INSERT"), got.toString)
    // an input column literally named "present" must not collide with
    // the diff's internal presence markers
    val p1 = Seq((1L, "a")).toDF("k", "present")
    val p2 = Seq((1L, "b")).toDF("k", "present")
    val d = graft.operators.Upsert.snapshotDiff(p1, p2, Seq("k")).collect()
    assert(d.length == 1 && d(0).getString(1) == "UPDATE")
    // worst case: an input column literally named the marker itself —
    // the suffix-growing guard must sidestep it (VERDICT r9 item 5)
    val m1 = Seq((1L, "a", true), (2L, "x", false)).toDF("k", "__diff_present__", "v")
      .select("k", "__diff_present__")
    val m2 = Seq((1L, "b")).toDF("k", "__diff_present__")
    val dm = graft.operators.Upsert.snapshotDiff(m1, m2, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dm == Map(1L -> "UPDATE", 2L -> "DELETE"), dm.toString)
  }

  test("scd2Apply: closes only the current row, preserves history, chains batches") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val dim = Seq(
      (1L, "a-v1", ts("2020-01-01"), ts("2021-01-01")), // history row — must not change
      (1L, "a-v2", ts("2021-01-01"), null.asInstanceOf[Timestamp]),
      (2L, "b-v1", ts("2020-01-01"), null.asInstanceOf[Timestamp]))
      .toDF("k", "v", "valid_from", "valid_to")
    val upd = Seq((1L, "a-v3", ts("2022-06-01"))).toDF("k", "v", "valid_from")
    val out = graft.operators.Upsert.scd2Apply(dim, upd, Seq("k"))
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4)
    // history row untouched
    assert(out(0).getString(1) == "a-v1" && out(0).getTimestamp(3) == ts("2021-01-01"))
    // current row closed at the update's asOf
    assert(out(1).getString(1) == "a-v2" && out(1).getTimestamp(3) == ts("2022-06-01"))
    // new open row
    assert(out(2).getString(1) == "a-v3" && out(2).isNullAt(3))
    // untouched key stays open
    assert(out(3).getString(1) == "b-v1" && out(3).isNullAt(3))
  }

  test("default fills source nulls only; cast failures still reach ErrorPolicy") {
    val df = Seq(("1", "10"), ("2", null), ("3", "x7")).toDF("id", "qty")
    val mappings = List(
      FieldMapping("id", "id", destFieldType = "LONG"),
      FieldMapping("qty", "qty", destFieldType = "INTEGER",
        defaultValue = Some("0"), isDestNullable = false))
    val mapped = MappingOp(df, mappings)
    val rows = mapped.orderBy("id").collect()
    assert(rows(1).getInt(1) == 0, "null source must take the default")
    assert(rows(2).isNullAt(1), "corrupt source must stay null, not take the default")
    val (good, n) = ErrorPolicy.enforce(mapped, mappings, ErrorHandling("LOG_ONLY"))
    assert(n == 1 && good.count() == 2)
  }

  test("maxErrorsAllowed fails the job BEFORE the destination write") {
    val out = tmpDir("capjob")
    val cfg = JobConfig(
      jobId = "cap1",
      source = SourceConfig("PARQUET", ConnectionDetails(path = Some(s"$sf/orders.parquet"))),
      destination = Some(DestinationConfig("PARQUET",
        ConnectionDetails(path = Some(s"$out/dest")))),
      mappings = List(
        FieldMapping("o_orderkey", "id", destFieldType = "LONG"),
        // BOOLEAN cast of a priority string nulls out every row ->
        // far more than 1 violation
        FieldMapping("o_orderpriority", "flag", destFieldType = "BOOLEAN", isDestNullable = false)),
      errorHandling = ErrorHandling("LOG_ONLY", maxErrorsAllowed = 1))
    val res = JobRunner.run(spark, cfg)
    assert(res.status.isInstanceOf[JobRunner.Failed], res.status.toString)
    assert(res.message.contains("maxErrorsAllowed"))
    // the cap must have fired before anything landed in the destination
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/dest")))
  }

  test("CSV destination VALIDATE_LOAD: read-back honors the writer's header default") {
    // writer defaults header=true; the read-back must not count header
    // lines as data rows (one spurious row per part file otherwise)
    val out = tmpDir("jobcsv")
    val cfg = JobConfig(
      jobId = "t1csv",
      source = SourceConfig("PARQUET", ConnectionDetails(
        path = Some(s"$sf/orders.parquet"), filter = Some("o_orderstatus = 'F'"))),
      destination = Some(DestinationConfig("CSV",
        ConnectionDetails(path = Some(s"$out/dest")))),
      mappings = List(
        FieldMapping("o_orderkey", "id", destFieldType = "LONG", isDestNullable = false),
        FieldMapping("o_orderstatus", "status")),
      steps = List("LOAD", "VALIDATE_LOAD", "NOTIFY_SUCCESS"))
    val res = JobRunner.run(spark, cfg)
    assert(res.status == JobRunner.Completed, res.message)
    assert(res.recordsWritten > 0)
    assert(res.stepsRun.contains("VALIDATE_LOAD"))
  }

  test("preamble+header binds columns by HEADER NAME, not mapping position") {
    val out = tmpDir("hdrorder")
    // header order (name,id) is the REVERSE of the mapping order
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/p.csv"),
      "preamble line\nanother one\nname,id\nalpha,1\nbeta,2\n")
    val mappings = List(FieldMapping("id", "id"), FieldMapping("label", "label"))
    val df = Readers.csv(spark, s"$out/p.csv",
      List(FieldMapping("id", "id"), FieldMapping("name", "name")),
      header = true, linesToSkip = 2)
    val rows = df.orderBy("id").collect()
    assert(rows.map(r => (r.getAs[String]("id"), r.getAs[String]("name"))).toSeq ==
      Seq(("1", "alpha"), ("2", "beta")))
  }

  test("includeHeader=false with linesToSkip=1 still skips the preamble line") {
    val out = tmpDir("skip1")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/p.csv"),
      "title line not data\n1,alpha\n2,beta\n")
    val mappings = List(FieldMapping("id", "id"), FieldMapping("label", "label"))
    val cfg = graft.model.SourceConfig("CSV", ConnectionDetails(
      path = Some(s"$out/p.csv"), includeHeader = Some(false), linesToSkip = Some(1)))
    val rows = Readers.forConfig(spark, cfg, mappings).orderBy("id").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "alpha"), ("2", "beta")))
  }

  test("preamble AND header row: linesToSkip>1 with includeHeader=true") {
    val out = tmpDir("preamblehdr")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/p.csv"),
      "report generated 2026-08-12\nsource: mainframe\nid,label\n1,alpha\n2,beta\n")
    val mappings = List(FieldMapping("id", "id"), FieldMapping("label", "label"))
    val df = Readers.csv(spark, s"$out/p.csv", mappings, header = true, linesToSkip = 2)
    // the header line must NOT surface as a data row
    assert(df.orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "alpha"), ("2", "beta")))
  }

  test("failure path: bad step -> Failed result, notifier fired (O15)") {
    var notified: Option[JobRunner.JobResult] = None
    val cfg = JobConfig(jobId = "t2",
      source = SourceConfig("PARQUET", ConnectionDetails(path = Some(s"$sf/orders.parquet"))),
      steps = List("NO_SUCH_STEP"))
    val res = JobRunner.run(spark, cfg,
      notifier = r => notified = Some(r))
    assert(res.status.isInstanceOf[JobRunner.Failed])
    assert(notified.exists(_.status.isInstanceOf[JobRunner.Failed]))
  }

  test("plugin transform hook (P8) applies a registered DataFrame function") {
    val cfg = JobConfig(jobId = "t3",
      source = SourceConfig("PARQUET", ConnectionDetails(path = Some(s"$sf/orders.parquet"))),
      mappings = List(FieldMapping("o_orderkey", "id", destFieldType = "LONG")),
      transformation = Transformation("PLUGIN", name = Some("only_even")))
    val df = JobRunner.buildDataFrame(spark, cfg,
      plugins = Map("only_even" -> (d => d.filter(col("id") % 2 === 0))))
    assert(df.filter(col("id") % 2 === 1).count() == 0)
    assert(df.count() > 0)
  }

  // ---------- config parsing ----------
  test("JobConfig JSON: reference dialects and unknown keys tolerated") {
    val json =
      """{
        |  "jobId": "j1", "unknownTopLevel": {"x": 1},
        |  "source": {"type": "CSV", "connectionDetails":
        |    {"path": "/tmp/x.csv", "whereClause": "a = 1", "delimiter": "|", "header": true}},
        |  "destination": {"type": "FLAT_FILE", "connectionDetails": {"fileName": "/tmp/out"},
        |    "batchSize": 500},
        |  "mappings": [
        |    {"sourceFieldName": "a", "destFieldName": "A", "destSqlType": "LONG",
        |     "destIsNullAllowed": false, "mystery": true},
        |    {"sourceFieldName": "b"}
        |  ],
        |  "errorHandling": {"strategy": "ROUTE_TO_FILE", "errorFilePath": "/tmp/err", "maxErrorsAllowed": 5},
        |  "steps": ["TRUNCATE_DESTINATION", "LOAD"]
        |}""".stripMargin
    val cfg = JobConfig.fromJson(json)
    assert(cfg.jobId == "j1")
    assert(cfg.source.connectionDetails.filter.contains("a = 1"))
    assert(cfg.source.connectionDetails.delimiter.contains("|"))
    assert(cfg.destination.get.connectionDetails.filePath.contains("/tmp/out"))
    assert(cfg.destination.get.batchSize == 500)
    assert(cfg.mappings.head.destinationFieldName == "A")
    assert(cfg.mappings.head.destFieldType == "LONG")
    assert(!cfg.mappings.head.isDestNullable)
    assert(cfg.mappings(1).destinationFieldName == "b") // defaults to source name
    assert(cfg.errorHandling.maxErrorsAllowed == 5)
    assert(cfg.steps == List("TRUNCATE_DESTINATION", "LOAD"))
  }

  test("partitioned parquet sink writes hive layout; read-back partition-prunes") {
    val out = tmpDir("partwrite")
    Writers.write(
      Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus"),
      DestinationConfig("PARQUET", ConnectionDetails(
        path = Some(s"$out/orders"), partitionKeys = List("o_orderstatus"))))
    // hive key=value directories, one per status
    val dirs = new java.io.File(s"$out/orders").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("o_orderstatus=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("o_orderstatus=[FOP]")), dirs.mkString(","))
    // a status filter must reach PartitionFilters, not the row scan
    val back = spark.read.parquet(s"$out/orders").filter(col("o_orderstatus") === "F")
    back.collect()
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"status filter not partition-pruned:\n$scan")
    assert(back.count() ==
      Tables.t(spark, sf, "orders").filter(col("o_orderstatus") === "F").count())
    // both JSON shapes parse: array and comma-string
    assert(JobConfig.fromJson(
      """{"jobId":"p1","source":{"type":"PARQUET","connectionDetails":{"path":"/x"}},
        |"destination":{"type":"PARQUET","connectionDetails":{"path":"/y","partitionKeys":["a","b"]}}}""".stripMargin)
      .destination.get.connectionDetails.partitionKeys == List("a", "b"))
    assert(JobConfig.fromJson(
      """{"jobId":"p2","source":{"type":"PARQUET","connectionDetails":{"path":"/x"}},
        |"destination":{"type":"PARQUET","connectionDetails":{"path":"/y","partitionBy":"a, b"}}}""".stripMargin)
      .destination.get.connectionDetails.partitionKeys == List("a", "b"))
  }

  test("compression knob reaches the file writer (zstd parquet, gzip csv)") {
    val out = tmpDir("codec")
    Writers.write(
      Tables.t(spark, sf, "nation").select("n_nationkey", "n_name"),
      DestinationConfig("PARQUET", ConnectionDetails(
        path = Some(s"$out/pq"), compression = Some("zstd"))))
    val pq = new java.io.File(s"$out/pq").listFiles().map(_.getName)
    assert(pq.exists(_.endsWith(".zstd.parquet")), s"no zstd parquet in ${pq.toSeq}")
    assert(spark.read.parquet(s"$out/pq").count() == 25)
    Writers.write(
      Tables.t(spark, sf, "nation").select("n_nationkey", "n_name"),
      DestinationConfig("CSV", ConnectionDetails(
        path = Some(s"$out/csv"), compression = Some("gzip"))))
    val cs = new java.io.File(s"$out/csv").listFiles().map(_.getName)
    assert(cs.exists(_.endsWith(".csv.gz")), s"no gzip csv in ${cs.toSeq}")
    assert(spark.read.option("header", "true").csv(s"$out/csv").count() == 25)
  }

  test("maxRecordsPerFile bounds output files; sortKeys order rows within each file") {
    val out = tmpDir("filelayout")
    Writers.write(
      Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      DestinationConfig("PARQUET", ConnectionDetails(
        path = Some(s"$out/orders"), sortKeys = List("o_orderkey"),
        maxRecordsPerFile = Some(100L))))
    val parts = new java.io.File(s"$out/orders").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length >= 15, s"1500 rows at <=100/file must split: got ${parts.length} files")
    // every file respects the bound and is internally sorted
    parts.foreach { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select("o_orderkey").collect().map(_.getLong(0))
      assert(keys.length <= 100, s"${f.getName} has ${keys.length} rows")
      assert(keys.sameElements(keys.sorted), s"${f.getName} not sorted by o_orderkey")
    }
    val total = spark.read.parquet(s"$out/orders").count()
    assert(total == Tables.t(spark, sf, "orders").count())
  }

  test("sortKeys survive hive partitioning (writer re-sorts by partition cols)") {
    val out = tmpDir("partsort")
    Writers.write(
      Tables.t(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus"),
      DestinationConfig("PARQUET", ConnectionDetails(
        path = Some(s"$out/orders"),
        partitionKeys = List("o_orderstatus"), sortKeys = List("o_orderkey"))))
    val partDirs = new java.io.File(s"$out/orders").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_orderstatus="))
    assert(partDirs.nonEmpty)
    partDirs.foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val keys = spark.read.parquet(f.getAbsolutePath)
          .select("o_orderkey").collect().map(_.getLong(0))
        assert(keys.sameElements(keys.sorted),
          s"${d.getName}/${f.getName} not sorted by o_orderkey within the file")
      }
    }
  }

  test("IncrementalAgg: merge of partial summaries equals recompute, incl. one-sided keys") {
    import graft.operators.IncrementalAgg
    val o = Tables.t(spark, sf, "orders")
    // split so at least one grouping key exists only in the delta:
    // status 'P' rows all land delta-side
    val base = o.filter(col("o_orderstatus") =!= "P" && col("o_orderkey") % 7 =!= 0)
    val delta = o.filter(col("o_orderstatus") === "P" || col("o_orderkey") % 7 === 0)
    assert(base.select("o_orderstatus").distinct().count() <
      o.select("o_orderstatus").distinct().count(),
      "fixture must exercise a delta-only key")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.summarize(base, Seq("o_orderstatus"), col("o_totalprice")),
      IncrementalAgg.summarize(delta, Seq("o_orderstatus"), col("o_totalprice")),
      Seq("o_orderstatus")).orderBy("o_orderstatus")
    val full = IncrementalAgg.summarize(o, Seq("o_orderstatus"), col("o_totalprice"))
      .orderBy("o_orderstatus")
    // counts/min/max identical; sums identical as exact decimals
    assert(merged.collect().toSeq.map(_.toSeq) == full.collect().toSeq.map(_.toSeq))
  }

  test("IncrementalAgg.deltaJoin: two-sided delta maintenance equals the full recompute") {
    import graft.operators.IncrementalAgg
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val c = Tables.t(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val (aOld, dA) = (o.filter(col("o_orderkey") % 3 =!= 0), o.filter(col("o_orderkey") % 3 === 0))
    val (bOld, dB) = (c.filter(col("o_custkey") % 4 =!= 0), c.filter(col("o_custkey") % 4 === 0))
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val maintained = IncrementalAgg.deltaJoin(
        aOld.join(bOld, Seq("o_custkey")), aOld, dA, bOld, dB, Seq("o_custkey"))
      .select("o_custkey", "o_orderkey").collect().map(key).toSet
    val recomputed = o.join(c, Seq("o_custkey"))
      .select("o_custkey", "o_orderkey").collect().map(key).toSet
    assert(maintained == recomputed)
    // both delta joins must contribute (split is genuinely two-sided)
    assert(dA.join(bOld, Seq("o_custkey")).limit(1).count() == 1)
    assert(aOld.join(dB, Seq("o_custkey")).limit(1).count() == 1)
  }

  test("lateArrivingResolve: iterated slices == full-dim join; unknown keys keep placeholder") {
    import graft.operators.Upsert
    val cust = Tables.t(spark, sf, "customer")
    def slice(cond: org.apache.spark.sql.Column) = cust.filter(cond)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey").as("nation"))
    // three arrival waves; c_custkey % 10 == 3 never arrives
    val waves = Seq(
      slice(col("c_custkey") % 3 === 0 && col("c_custkey") % 10 =!= 3),
      slice(col("c_custkey") % 3 === 1 && col("c_custkey") % 10 =!= 3),
      slice(col("c_custkey") % 3 === 2 && col("c_custkey") % 10 =!= 3))
    val facts0 = Tables.t(spark, sf, "orders").select(col("o_custkey"), col("o_orderkey"))
      .withColumn("nation", lit(-1))
    val resolved = waves.foldLeft(facts0)(
      (f, w) => Upsert.lateArrivingResolve(f, w, "o_custkey", "nation", lit(-1)))
    val expected = Tables.t(spark, sf, "orders").select(col("o_custkey"), col("o_orderkey"))
      .join(slice(col("c_custkey") % 10 =!= 3), Seq("o_custkey"), "left")
      .withColumn("nation", coalesce(col("nation"), lit(-1)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey", "nation").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(resolved) == rows(expected))
    assert(resolved.filter(col("nation") === -1).limit(1).count() == 1,
      "fixture must exercise a never-arriving key")
  }

  test("lateArrivingResolve never drops NULL dim values (null-safe classification)") {
    import graft.operators.Upsert
    import spark.implicits._
    // facts: one placeholder row, one resolved row, one NULL-value row
    val facts = Seq((1L, 10L, Some(-1)), (2L, 20L, Some(7)), (3L, 30L, None))
      .toDF("k", "fact_id", "nation")
      .select(col("k"), col("fact_id"), col("nation").cast("int"))
    val dim = Seq((1L, 5), (3L, 9)).toDF("k", "nation")
    val out = Upsert.lateArrivingResolve(facts, dim, "k", "nation", lit(-1))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    // placeholder row resolves; real value passes through; NULL value
    // is NOT the placeholder — passes through untouched, never dropped
    assert(out == Set((10L, Some(5)), (20L, Some(7)), (30L, None)), out)
    // NULL placeholder: exactly the NULL rows are pending and repair
    val out2 = Upsert.lateArrivingResolve(
        facts, dim, "k", "nation", lit(null).cast("int"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet
    assert(out2 == Set((10L, Some(-1)), (20L, Some(7)), (30L, Some(9))), out2)
  }

  test("backfillPartitions replaces only the batch's partitions and restores the conf") {
    import spark.implicits._
    val dir = tmpDir("graft_backfill_") + "/t"
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "p").write.partitionBy("p").parquet(dir)
    // sanity of the footgun this helper fences: session default is
    // NOT dynamic (static would drop partitions a and c)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
    graft.sinks.Writers.backfillPartitions(
      Seq((30L, "b"), (31L, "b")).toDF("id", "p"), dir, Seq("p"))
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // partition b fully replaced (3 gone, 30/31 present once); a, c intact
    assert(got == Set((1L, "a"), (2L, "a"), (30L, "b"), (31L, "b"), (4L, "c")), got)
    // conf restored to the pre-call state
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
    // idempotent: the same batch re-applied converges to the same rows
    graft.sinks.Writers.backfillPartitions(
      Seq((30L, "b"), (31L, "b")).toDF("id", "p"), dir, Seq("p"))
    assert(spark.read.parquet(dir).count() == 5)
  }
}
