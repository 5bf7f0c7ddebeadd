package graft

import org.apache.spark.sql.functions._

/** The DSV2 fixed-width connector: correctness vs the substring
  * reader, and source-level column pruning visible in the scan. */
class FixedWidthDsv2Spec extends SparkTestBase {

  private lazy val dataDir: String = {
    val d = tmpDir("fwv2")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/a.txt"),
      "001alpha     42\n002beta      17\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/b.txt"),
      "003gamma     99\n")
    d
  }

  private def read() = spark.read
    .format("graft.sources.FixedWidthDataSource")
    .option("path", dataDir)
    .option("fields", "id:1:3,name:4:10,qty:14:2")
    .load()

  test("reads a directory of files with file-level partitions") {
    val rows = read().orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("001", "alpha", "42"), ("002", "beta", "17"), ("003", "gamma", "99")))
  }

  test("column pruning reaches the source scan") {
    val pruned = read().select("name")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("cols=name"), s"scan not pruned:\n$plan")
    assert(!plan.contains("cols=id,name,qty"), "scan decoded all columns for a 1-column projection")
  }

  test("short lines: columns past end-of-line are null (error-policy food)") {
    val d = tmpDir("fwv2short")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/s.txt"), "004x\n")
    val rows = spark.read.format("graft.sources.FixedWidthDataSource")
      .option("path", s"$d/s.txt").option("fields", "id:1:3,name:4:10,qty:14:2")
      .load().collect()
    assert(rows(0).getString(0) == "004")
    assert(rows(0).getString(1) == "x")
    assert(rows(0).isNullAt(2))
  }
}
