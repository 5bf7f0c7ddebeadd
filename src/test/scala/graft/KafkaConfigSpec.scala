package graft

import graft.model.{ConnectionDetails, JobConfig, SourceConfig}
import graft.sources.Readers

/** Kafka source configuration contract (reference declares KAFKA,
  * etlModel.java:189, kafka deps in etlcorepom.xml, but implements no
  * data-plane reader; its Kafka usage is the control-plane trigger —
  * JobQueue here). No connector jar or broker in this harness, so the
  * honest ceiling is the option-builder contract, like JdbcConfigSpec. */
class KafkaConfigSpec extends SparkTestBase {

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
