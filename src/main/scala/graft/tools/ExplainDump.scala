package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of each (or selected) registered
  * queries — the review loop for shuffle/pushdown/broadcast hygiene.
  * Usage: runMain graft.tools.ExplainDump <sfDir> [queryName ...] */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.registry.filter(q => only.isEmpty || only(q.name)).foreach { q =>
      println(s"\n===================== ${q.name} =====================")
      try println(q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
