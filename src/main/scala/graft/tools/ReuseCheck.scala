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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries(name)(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("SCANS=" + p.linesIterator.count(_.contains("FileScan parquet")))
    println("REUSED=" + p.linesIterator.count(_.contains("ReusedExchange")))
    spark.stop()
  }
}
