package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev-loop timer: run one registered query N times through the noop
 * sink (same measurement as graft.Bench) and print per-iteration and
 * median seconds. The box has ±2-3x run-to-run variance, so Bench's
 * single shot can't tell an optimization from noise — repeated
 * medians can.
 *
 *   runMain graft.tools.TimeQuery <queryName> [sfDir] [n]
 */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQuery <queryName> [sfDir] [n]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // keep bucket pruning for the indexed-retrieval gates (see Bench)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"no such query: $name"))
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[time] $name iter $i: $dt%.3f s")
      dt
    }
    val sorted = times.sorted
    val med = // true median: mean of the middle two for even n
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    println(f"[time] $name median of $n: $med%.3f s (min ${times.min}%.3f, max ${times.max}%.3f)")
    spark.stop()
  }
}
