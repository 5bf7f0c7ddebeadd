package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 profiling scratchpad (guide §1.2): time sub-stages of the
  * bench's hottest queries so the optimization targets the dominant
  * stage, not a guess. Usage: runMain graft.tools.ProfileR20 <which> [sfDir] */
object ProfileR20 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("pagerank")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }

    which match {
      case "pagerank" =>
        val it = graft.Tables.t(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val a = it.select(col("l_orderkey"), col("l_partkey").as("u"))
        val b = it.select(col("l_orderkey"), col("l_partkey").as("v"))
        val e = a.join(b, Seq("l_orderkey"))
          .filter(col("u") < col("v"))
          .groupBy("u", "v").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select("u", "v")
        val sym = t("edge build (count)") {
          val s = graft.operators.Graphs.symmetric(e)
            .select(col("u").as("src"), col("v").as("dst")).localCheckpoint()
          println(s"  |sym| = ${s.count()}")
          s
        }
        val nJobs = new java.util.concurrent.atomic.AtomicLong
        val nTasks = new java.util.concurrent.atomic.AtomicLong
        val taskMs = new java.util.concurrent.atomic.AtomicLong
        val deserMs = new java.util.concurrent.atomic.AtomicLong
        val gcMs = new java.util.concurrent.atomic.AtomicLong
        val cpuMs = new java.util.concurrent.atomic.AtomicLong
        val stageAgg = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            nJobs.incrementAndGet()
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val key = s.stageInfo.name.takeWhile(_ != '('). take(40)
            val m = s.stageInfo.taskMetrics
            val arr = stageAgg.computeIfAbsent(key, _ => new Array[Long](3))
            arr.synchronized {
              arr(0) += 1
              arr(1) += s.stageInfo.numTasks
              if (m != null) arr(2) += m.executorRunTime
            }
          }
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            if (te.taskInfo != null) {
              nTasks.incrementAndGet()
              taskMs.addAndGet(te.taskInfo.duration)
            }
            if (te.taskMetrics != null) {
              deserMs.addAndGet(te.taskMetrics.executorDeserializeTime)
              gcMs.addAndGet(te.taskMetrics.jvmGCTime)
              cpuMs.addAndGet(te.taskMetrics.executorCpuTime / 1000000L)
            }
          }
        })
        val cg = org.apache.spark.metrics.source.CodegenMetrics
        val c0 = cg.METRIC_COMPILATION_TIME.getCount
        val n0 = cg.METRIC_COMPILATION_TIME.getSnapshot.size()
        val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            Thread.getAllStackTraces.forEach { (th, st) =>
              val n = th.getName
              if ((n == "main" || n.startsWith("dag-scheduler") || n.startsWith("run-main")) && st.nonEmpty) {
                val key = n.take(8) + "| " + st.take(4).map(f => f.getClassName.split("\\.").last + "." + f.getMethodName).mkString(" <- ")
                hist.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
              }
            }
            Thread.sleep(20)
          }
        })
        sampler.setDaemon(true); sampler.start()
        t("pageRank loop") {
          graft.operators.Graphs.pageRank(sym)
            .write.format("noop").mode("overwrite").save()
        }
        sampling = false
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2.get).take(12).foreach { case (k, v) =>
          println(f"  [stack ${v.get}%5d] $k")
        }
        println(s"  codegen compiles during loop: ${cg.METRIC_COMPILATION_TIME.getCount - c0} " +
          s"(hist n ${cg.METRIC_COMPILATION_TIME.getSnapshot.size() - n0}, mean ${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean}ms)")
        Thread.sleep(500)
        println(s"  jobs=${nJobs.get} tasks=${nTasks.get} taskTime=${taskMs.get / 1000.0}s " +
          s"deser=${deserMs.get / 1000.0}s gc=${gcMs.get / 1000.0}s cpu=${cpuMs.get / 1000.0}s")
        import scala.jdk.CollectionConverters._
        stageAgg.asScala.toSeq.sortBy(-_._2(2)).take(12).foreach { case (k, v) =>
          println(f"  stage $k%-42s n=${v(0)}%3d tasks=${v(1)}%5d runMs=${v(2)}%7d")
        }
      case "ingest_dedup" =>
        val docs = graft.Tables.t(spark, sfDir, "documents").select("doc_id", "text")
        val work = graft.CacheDirs.tempWorkDir("prof_ingest_").toString
        t("stage batches") {
          docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$work/b0")
          docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$work/b1")
        }
        val b0 = spark.read.parquet(s"$work/b0")
        val b1 = spark.read.parquet(s"$work/b1")
        t("minhashNearDups(b0) noop") {
          graft.operators.Dedup.minhashNearDups(b0, "doc_id", "text")
            .write.format("noop").mode("overwrite").save()
        }
        t("signatureBandRows(b0) write") {
          graft.operators.Dedup.signatureBandRows(b0, "doc_id", "text")
            .write.mode("overwrite").parquet(s"$work/sk0")
        }
        t("incrementalNearDupsFromSketch(b1) noop") {
          graft.operators.Dedup.incrementalNearDupsFromSketch(
              spark.read.parquet(s"$work/sk0"), b0, b1, "doc_id", "text")
            .write.format("noop").mode("overwrite").save()
        }
        val pairs = graft.operators.Dedup.minhashNearDups(
          docs, "doc_id", "text").select("doc_a", "doc_b").localCheckpoint()
        t("clusters(all pairs)") {
          graft.operators.Dedup.clusters(pairs)
            .write.format("noop").mode("overwrite").save()
        }
        t("full etl_ingest_dedup") {
          graft.SparkEntry.queries("etl_ingest_dedup")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      case "rank_scalable" =>
        val li = graft.Tables.t(spark, sfDir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
        t("segmentedRanks noop (no final sort)") {
          graft.operators.Ranking.segmentedRanks(li, "l_returnflag",
              Seq("l_quantity", "l_orderkey", "l_linenumber"),
              buckets = 32, ntiles = Some(4))
            .write.format("noop").mode("overwrite").save()
        }
        t("plain single-window form noop") {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("l_returnflag")
            .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
          li.withColumn("rnk", rank().over(w))
            .withColumn("rn", row_number().over(w))
            .write.format("noop").mode("overwrite").save()
        }
        t("full window_rank_scalable (with sort)") {
          graft.SparkEntry.queries("window_rank_scalable")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      case "prefix_pairs" =>
        val docs = graft.Tables.t(spark, sfDir, "documents")
        val spine = graft.operators.Dedup.shingles(docs, "doc_id", "text")
        t("shingle explode + df groupBy (count)") {
          println("  freq rows = " + spine.groupBy("shingle")
            .agg(count(lit(1))).count())
        }
        t("full dedup_prefix_pairs") {
          graft.SparkEntry.queries("dedup_prefix_pairs")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      case other => sys.error(s"unknown profile: $other")
    }
    spark.stop()
  }
}
