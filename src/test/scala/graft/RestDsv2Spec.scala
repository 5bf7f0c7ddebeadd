package graft

import graft.model.{ConnectionDetails, FieldMapping, SourceConfig}
import graft.sources.{Readers, RestDataSource}
import org.apache.spark.sql.functions._

/** The DSV2 paginated REST connector: page-per-partition parallelism,
  * declared schema, pruning, payload shapes, and the forConfig wiring. */
class RestDsv2Spec extends SparkTestBase {

  private def withFakeTransport[T](pages: Map[Int, String])(body: => T): T = {
    val orig = RestDataSource.transport
    RestDataSource.transport = { url =>
      val p = url.split("=").last.toInt
      pages.getOrElse(p, "")
    }
    try body finally RestDataSource.transport = orig
  }

  private val threePages = Map(
    1 -> """{"id": "1", "name": "a", "qty": 10}
           |{"id": "2", "name": "b", "qty": 20}""".stripMargin,
    2 -> """[{"id": "3", "name": "c", "qty": 30}, {"id": "4", "name": "d", "qty": 40}]""",
    3 -> "")

  private def read(pages: Int) = spark.read
    .format("graft.sources.RestDataSource")
    .option("url", "https://api.invalid/items?page={page}")
    .option("pages", pages.toString)
    .option("fields", "id,name,qty")
    .load()

  test("pages fetch as separate partitions; JSON-lines and array bodies both parse") {
    withFakeTransport(threePages) {
      val df = read(3)
      assert(df.rdd.getNumPartitions == 3, "one partition per page")
      val rows = df.orderBy("id").collect()
      assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
        Seq(("1", "a", "10"), ("2", "b", "20"), ("3", "c", "30"), ("4", "d", "40")))
    }
  }

  test("over-provisioned page count: empty pages contribute zero rows") {
    withFakeTransport(threePages) {
      assert(read(3).count() == 4) // page 3 is empty
    }
  }

  test("column pruning reaches the source scan") {
    withFakeTransport(threePages) {
      val pruned = read(2).select("name")
      pruned.collect()
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("cols=name"), s"scan not pruned:\n$plan")
    }
  }

  test("missing keys surface as null; non-text values stringify") {
    withFakeTransport(Map(1 -> """{"id": "9", "qty": 1.5}""")) {
      val r = read(1).collect()(0)
      assert(r.getString(0) == "9")
      assert(r.isNullAt(1))     // no "name" key
      assert(r.getString(2) == "1.5")
    }
  }

  test("paginated url without {page} is rejected (would duplicate rows silently)") {
    val cfg = SourceConfig("REST", ConnectionDetails(
      path = Some("https://api.invalid/items"), numPartitions = Some(4)))
    val e = intercept[IllegalArgumentException](
      Readers.forConfig(spark, cfg, List(FieldMapping("id", "id"))))
    assert(e.getMessage.contains("{page}"))
  }

  test("forConfig routes numPartitions>0 REST configs to the paginated scan") {
    withFakeTransport(threePages) {
      val cfg = SourceConfig("REST", ConnectionDetails(
        path = Some("https://api.invalid/items?page={page}"), numPartitions = Some(2)))
      val mappings = List(
        FieldMapping("id", "ItemId", destFieldType = "LONG"),
        FieldMapping("qty", "Quantity", destFieldType = "INTEGER"))
      val out = graft.operators.MappingOp(
        Readers.forConfig(spark, cfg, mappings), mappings).orderBy("ItemId").collect()
      assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)))
    }
  }
}
