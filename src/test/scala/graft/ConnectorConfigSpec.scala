package graft

import graft.model.{ConnectionDetails, JobConfig, SourceConfig}
import graft.sources.Readers

/** Kafka/Mongo/Elasticsearch connector configuration contracts (reference declares KAFKA,
  * etlModel.java:189, kafka deps in etlcorepom.xml, but implements no
  * data-plane reader; its Kafka usage is the control-plane trigger —
  * JobQueue here). No connector jar or broker in this harness, so the
  * honest ceiling is the option-builder contract, like JdbcConfigSpec. */
class ConnectorConfigSpec extends SparkTestBase {

  test("kafkaOptions builds the structured-source option map") {
    val cfg = SourceConfig("KAFKA", ConnectionDetails(
      bootstrapServers = Some("broker1:9092,broker2:9092"),
      topic = Some("events"),
      startingOffsets = Some("latest"),
      fetchSize = Some(5000)))
    val opts = Readers.kafkaOptions(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(opts("failOnDataLoss") == "false")
  }

  test("defaults: earliest offsets, bounded per-trigger read") {
    val opts = Readers.kafkaOptions(SourceConfig("KAFKA", ConnectionDetails(
      bootstrapServers = Some("b:9092"), topic = Some("t"))))
    assert(opts("startingOffsets") == "earliest")
    assert(opts("maxOffsetsPerTrigger") == "10000")
  }

  test("missing brokers or topic fail fast with a named message") {
    val noBrokers = SourceConfig("KAFKA", ConnectionDetails(topic = Some("t")))
    assert(intercept[IllegalArgumentException](
      Readers.kafkaOptions(noBrokers)).getMessage.contains("bootstrapServers"))
    val noTopic = SourceConfig("KAFKA", ConnectionDetails(bootstrapServers = Some("b:9092")))
    assert(intercept[IllegalArgumentException](
      Readers.kafkaOptions(noTopic)).getMessage.contains("topic"))
  }

  test("mongo source options: uri/database/collection + equality filter -> $match") {
    val cfg = SourceConfig("MONGODB", ConnectionDetails(
      jdbcUrl = Some("mongodb://host1:27017/appdb"),
      tableName = Some("orders"),
      filter = Some("status = 'F'")))
    val opts = Readers.mongoOptions(cfg)
    assert(opts("connection.uri") == "mongodb://host1:27017/appdb")
    assert(opts("database") == "appdb")
    assert(opts("collection") == "orders")
    assert(opts("aggregation.pipeline") == """[{"$match": {"status": "F"}}]""")
    // no filter -> no pipeline entry
    val bare = Readers.mongoOptions(SourceConfig("MONGODB", ConnectionDetails(
      jdbcUrl = Some("mongodb://h/db"), tableName = Some("c"))))
    assert(!bare.contains("aggregation.pipeline"))
    // missing pieces fail fast
    assert(intercept[IllegalArgumentException](Readers.mongoOptions(
      SourceConfig("MONGODB", ConnectionDetails(tableName = Some("c"))))).getMessage.contains("uri"))
    // no database path segment must NOT fall back to the host:port
    assert(intercept[IllegalArgumentException](Readers.mongoOptions(
      SourceConfig("MONGODB", ConnectionDetails(
        jdbcUrl = Some("mongodb://host1:27017"), tableName = Some("c")))))
      .getMessage.contains("database"))
    // query params stay out of the database name
    val qp = Readers.mongoOptions(SourceConfig("MONGODB", ConnectionDetails(
      jdbcUrl = Some("mongodb://host/appdb?replicaSet=rs0"), tableName = Some("c"))))
    assert(qp("database") == "appdb")
  }

  test("elasticsearch sink options: nodes/index/batch/auth") {
    val dest = graft.model.DestinationConfig("ELASTICSEARCH",
      ConnectionDetails(jdbcUrl = Some("es1:9200,es2:9200"), tableName = Some("events-2026"),
        username = Some("svc")),
      batchSize = 2500, saveMode = "append")
    val opts = graft.sinks.Writers.elasticsearchOptions(dest)
    assert(opts("es.nodes") == "es1:9200,es2:9200")
    assert(opts("es.resource") == "events-2026")
    assert(opts("es.batch.size.entries") == "2500")
    assert(opts("es.write.operation") == "create")
    assert(opts("es.net.http.auth.user") == "svc")
    assert(!opts.contains("es.net.http.auth.pass")) // env var unset
  }

  test("kafka + jdbc stride fields parse from job-config JSON") {
    val cfg = JobConfig.fromJson(
      """{"jobId": "k1",
        |  "source": {"type": "KAFKA", "connectionDetails": {
        |    "bootstrapServers": "b:9092", "topic": "ev", "startingOffsets": "latest",
        |    "partitionColumn": "id", "numPartitions": 4,
        |    "lowerBound": 10, "upperBound": 500000}},
        |  "mappings": [{"sourceFieldName": "value", "destinationFieldName": "v"}]
        |}""".stripMargin)
    val c = cfg.source.connectionDetails
    assert(c.bootstrapServers.contains("b:9092"))
    assert(c.topic.contains("ev"))
    assert(c.startingOffsets.contains("latest"))
    assert(c.lowerBound.contains(10L))
    assert(c.upperBound.contains(500000L))
  }
}
