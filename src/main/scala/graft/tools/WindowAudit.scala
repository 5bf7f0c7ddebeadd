package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Dev audit for single-partition window sorts, two detectors:
  *  1. static — WindowExec with empty partitionSpec in the final
  *     executed plan;
  *  2. dynamic — the QUERY marker lines on stderr interleave with
  *     Spark's own `WindowExec: No Partition Defined` WARNs, so a
  *     warning between two markers pins the emitting query even when
  *     the window lives in a driver-side INTERMEDIATE action or a
  *     streaming micro-batch plan the final plan never shows.
  * Run with grep -E "QUERY |WindowExec" to read the interleaving. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def emptyWindows(p: SparkPlan): Int = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => 1
        case _ => 0
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => emptyWindows(a.executedPlan)
        case q: QueryStageExec => emptyWindows(q.plan)
        case _ => 0
      }
      self + nested + p.children.map(emptyWindows).sum
    }
    graft.Queries.registry.foreach { q =>
      System.err.println(s"QUERY ${q.name}")
      System.err.flush()
      try {
        val df = q.fn(spark, sfDir)
        df.collect()
        val n = emptyWindows(df.queryExecution.executedPlan)
        if (n > 0) System.err.println(s"HIT $n unpartitioned window(s) in final plan: ${q.name}")
      } catch { case e: Throwable => System.err.println(s"ERR ${q.name}: ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    System.err.println("AUDIT DONE")
    spark.stop()
  }
}
