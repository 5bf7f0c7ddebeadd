package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: parquet reader init, codegen
    // compiler, shuffle machinery. The metric is the sum of per-query
    // times, so one untimed throwaway query keeps JVM warmup out of
    // whichever query happens to run first.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // Sorted order: stable run-to-run and round-to-round comparisons
    // (Map iteration order would shuffle which query pays warm-cache
    // effects as the registry grows).
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every
      // projected column and eliminate the final sort, so map-only
      // queries would be timed as bare row-count scans — the noop
      // write evaluates the full output the query exists to produce.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop their persisted intermediates so
      // earlier queries' caches don't GC-tax later ones
      spark.catalog.clearCache()
      name -> dt
    }
    // Millisecond precision keeps the JSON line well under the
    // driver's output-tail capture window: full-precision doubles for
    // 72+ queries pushed the line past it and the driver recorded the
    // round-2 bench as unparseable. 3 decimals is far below the
    // ±2-3x run-to-run noise on this box anyway.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
