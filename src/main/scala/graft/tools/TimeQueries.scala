package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev-loop A/B timer over a SET of registered queries: same
 * measurement as graft.Bench (noop sink, min-of-N), plus arbitrary
 * session conf overrides from SPARK_GRAFT_CONF ("k=v;k=v") so config
 * experiments (AQE coalescing, advisory sizes) can be timed on a
 * focused subset without a 20-minute full-bench round trip.
 *
 *   SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
 *     sbt "runMain graft.tools.TimeQueries <n> <sfDir> <query> [query ...]"
 */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQueries <n> <sfDir> <query> [query ...]")
    val n = args(0).toInt
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach { s =>
      s.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    var total = 0.0
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"no such query: $name"))
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      total += times.min
      println(f"[timeqs] $name%-36s min ${times.min}%7.3f  all ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    println(f"[timeqs] TOTAL(min) $total%.3f over ${names.size} queries")
    spark.stop()
  }
}
