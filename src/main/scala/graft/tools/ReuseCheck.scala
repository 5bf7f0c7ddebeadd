package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the FINAL (post-AQE) executed plan of a query. */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("orders_cycle_time")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "--all") {
      graft.Queries.registry.foreach { q =>
        try {
          val df = q.fn(spark, sfDir)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head
          val scans = p.linesIterator.count(_.contains("FileScan parquet"))
          if (scans >= 8) println(f"SCANHOG $scans%3d ${q.name}")
        } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage.take(60)}") }
        spark.catalog.clearCache()
      }
      println("AUDIT DONE")
    } else {
      val df = graft.Queries.queries(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val fin = p.split("== Initial Plan ==").head // AQE toString appends the initial plan too
      println("SCANS=" + fin.linesIterator.count(_.contains("FileScan parquet")))
      println("REUSED=" + fin.linesIterator.count(_.contains("ReusedExchange")))
      println("SMJ=" + fin.linesIterator.count(_.contains("SortMergeJoin")))
      println("BHJ=" + fin.linesIterator.count(_.contains("BroadcastHashJoin")))
    }
    spark.stop()
  }
}
