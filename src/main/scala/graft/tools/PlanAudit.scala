package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: list registry queries whose EXECUTED plan contains a
  * given fragment (default: CartesianProduct). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val frag = if (args.length > 1) args(1) else "CartesianProduct"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC") // match Verify/tests
      .config("spark.ui.enabled", "false")
      // keep bucket pruning for the indexed-retrieval gates (see Bench)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.registry.foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        if (plan.contains(frag)) println(s"HIT $frag: ${q.name}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getMessage.take(80)}") }
      spark.catalog.clearCache()
    }
    println("AUDIT DONE")
    spark.stop()
  }
}
