package graft

import graft.job.{JobMetrics, JobQueue, JobRunner}
import org.apache.spark.sql.functions._

class OrchestrationSpec extends SparkTestBase {

  test("SQL extensions: all injected builders callable from spark.sql") {
    // injectFunction needs a session BUILT with extensions (the shared
    // test session already exists) — registering the REAL builder
    // lambdas on the registry exercises the same arity/coercion/
    // argument-order code the extension injects.
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (id, _, builder) =>
      reg.createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
    val r = spark.sql(
      "SELECT fingerprint('abc') AS fp, dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp, " +
        "word_shingles('a b c', 2) AS ws, simhash64('a b c') AS sh, " +
        "minhash_band_keys(word_shingles('a b c d', 3), 128, 32) AS bk, " +
        "array_count_less(array(1.0d, 2.0d, 3.0d), 2.5d) AS acl")
      .collect()(0)
    assert(r.getLong(0) == 96354L) // canonical 'abc' fold value
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    assert(r.getLong(3) != 0L)
    assert(r.getSeq[Long](4).length == 32)
    assert(r.getInt(5) == 2)
    // the SQL-built sketch must agree with the Column-API one
    import spark.implicits._
    val viaApi = Seq("a b c d").toDF("t").select(
      graft.functions.HashSketches.minhashBandKeys(
        graft.functions.Shingles.wordShingles(org.apache.spark.sql.functions.col("t"), 3),
        128, 32)).collect()(0).getSeq[Long](0)
    assert(r.getSeq[Long](4) == viaApi)
    // the aggregate builder: bare AggregateFunction wrapped by analysis
    val tk = spark.sql(
      "SELECT topk_pairs(v, p, 2) AS t FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS x(v, p)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
    // freq_sketch aggregate: MG candidates with the hot key surviving
    val fs = spark.sql(
      "SELECT freq_sketch(t, 2) AS s FROM VALUES ('a'), ('a'), ('a'), ('b'), ('c') AS x(t)")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(fs.map(_.getString(0)).contains("a"))
    assert(fs.length <= 2)
    // builder misuse fails loudly: wrong arity, non-literal geometry
    intercept[Exception](spark.sql("SELECT simhash64('a', 'b')").collect())
    intercept[Exception](spark.sql("SELECT word_shingles('a b', 4294967297)").collect())
  }

  test("job queue: ack-after-run, DLQ for poison and failed configs") {
    val inbox = tmpDir("queue")
    val out = tmpDir("queue_out")
    // good job
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inbox/a_good.json"),
      s"""{"jobId":"good1","source":{"type":"PARQUET","connectionDetails":{"path":"$sf/region.parquet"}},
         |"destination":{"type":"PARQUET","connectionDetails":{"path":"$out/region"}},
         |"mappings":[{"sourceFieldName":"r_regionkey","destinationFieldName":"id","destFieldType":"LONG"}]}""".stripMargin)
    // poison (unparseable)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inbox/b_poison.json"), "{not json")
    // failing job (missing source path)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inbox/c_bad.json"),
      """{"jobId":"bad1","source":{"type":"PARQUET","connectionDetails":{}},
        |"destination":{"type":"PARQUET","connectionDetails":{"path":"/tmp/never"}}}""".stripMargin)
    val q = new JobQueue(spark, inbox)
    val results = q.drainOnce()
    assert(results("a_good.json").status == JobRunner.Completed)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$inbox/done/a_good.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$inbox/failed/b_poison.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$inbox/failed/c_bad.json")))
    assert(spark.read.parquet(s"$out/region").count() == 5)
    // inbox drained
    assert(q.drainOnce().isEmpty)
  }

  test("queue crash recovery: stale processing/ claims requeue on start") {
    val inbox = tmpDir("queue_rec")
    val out = tmpDir("queue_rec_out")
    new JobQueue(spark, inbox) // lays out inbox/done/failed/processing
    // a claim left behind by a consumer that died mid-job
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$inbox/processing/stale_good.json"),
      s"""{"jobId":"rec1","source":{"type":"PARQUET","connectionDetails":{"path":"$sf/region.parquet"}},
         |"destination":{"type":"PARQUET","connectionDetails":{"path":"$out/region"}},
         |"mappings":[{"sourceFieldName":"r_regionkey","destinationFieldName":"id","destFieldType":"LONG"}]}""".stripMargin)
    val fresh = new JobQueue(spark, inbox) // restart -> requeue
    val results = fresh.drainOnce()
    assert(results("stale_good.json").status == JobRunner.Completed)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$inbox/done/stale_good.json")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$inbox/processing/stale_good.json")))
  }

  test("job metrics listener aggregates task metrics per job group") {
    val m = new JobMetrics(spark)
    try {
      spark.sparkContext.setJobGroup("metrics-test", "test", true)
      Tables.t(spark, sf, "lineitem").agg(count(lit(1))).collect()
      spark.sparkContext.clearJobGroup()
      // listener bus is async — poll until the events drain
      val deadline = System.currentTimeMillis() + 10000
      while (m.counters("metrics-test").forall(_.recordsRead.get() < 6000L)
             && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val c = m.counters("metrics-test")
      assert(c.isDefined, "no counters recorded for the job group")
      assert(c.get.recordsRead.get() == 6000L, s"recordsRead=${c.get.recordsRead.get()}")
    } finally m.close()
  }

  test("live progress percent against the pre-counted source total (O10)") {
    val m = new JobMetrics(spark)
    JobRunner.attachMetrics(m)
    try {
      var seen: Option[Double] = None
      val cfg = graft.model.JobConfig(
        jobId = "prog1",
        source = graft.model.SourceConfig("PARQUET",
          graft.model.ConnectionDetails(path = Some(s"$sf/orders.parquet"))),
        destination = Some(graft.model.DestinationConfig("PARQUET",
          graft.model.ConnectionDetails(path = Some(s"${tmpDir("prog")}/dest")))),
        mappings = List(graft.model.FieldMapping("o_orderkey", "id", destFieldType = "LONG")))
      val res = JobRunner.run(spark, cfg, notifier = r => {
        // notifier fires while run state is live; listener events are
        // async, so poll the bus briefly
        val deadline = System.currentTimeMillis() + 10000
        while ({ seen = JobRunner.progress(r.configKey); seen.forall(_ <= 0.0) }
               && System.currentTimeMillis() < deadline) Thread.sleep(100)
      })
      assert(res.status == JobRunner.Completed, res.message)
      assert(seen.exists(p => p > 0.0 && p <= 100.0), s"progress=$seen")
      // after the run, live-progress state is cleared
      assert(JobRunner.progress(res.configKey).isEmpty)
    } finally { JobRunner.detachMetrics(); m.close() }
  }

  test("cooperative cancellation via job groups (O11)") {
    val t = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup("cancel-test", "slow", true)
        // a slow job: cartesian lineitem x lineitem
        val li = Tables.t(spark, sf, "lineitem")
        li.crossJoin(li.withColumnRenamed("l_orderkey", "k2")).count()
      } catch { case _: Throwable => () } // expected: cancelled
      finally spark.sparkContext.clearJobGroup()
    })
    t.start()
    Thread.sleep(1500)
    spark.sparkContext.cancelJobGroup("cancel-test")
    t.join(30000)
    assert(!t.isAlive, "cancelled job thread should have terminated")
  }
}
