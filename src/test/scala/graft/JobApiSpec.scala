package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.job.JobApi

/** REST control plane: submit → poll → result over real HTTP. */
class JobApiSpec extends SparkTestBase {

  private def http = HttpClient.newHttpClient()
  private def get(url: String) =
    http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(url: String, body: String) =
    http.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(url: String) =
    http.send(HttpRequest.newBuilder(URI.create(url)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  test("duplicate jobId submits dedupe to the same configKey while queued (O8)") {
    import graft.job.JobRunner
    import graft.model.JobConfig
    val cfg = JobConfig.fromJson(
      s"""{"jobId":"dup-test-01",
         |"source":{"type":"PARQUET","connectionDetails":{"path":"$sf/region.parquet"}},
         |"destination":{"type":"PARQUET","connectionDetails":{"path":"${tmpDir("dup_out")}/r"}}}""".stripMargin)
    // a single-thread pool occupied by a blocker keeps the job Pending
    // for the duration of the check — the dedupe is deterministic
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val gate = new java.util.concurrent.CountDownLatch(1)
    pool.submit(new Runnable { override def run(): Unit = gate.await() })
    try {
      val k1 = JobRunner.submitAsync(spark, cfg, pool)
      val k2 = JobRunner.submitAsync(spark, cfg, pool)
      assert(k1 == k2, "second submit of a queued jobId must return the same key")
      assert(JobRunner.status(k1).exists(_.status == JobRunner.Pending))
    } finally {
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    }
  }

  test("POST /jobs submits async; GET /jobs/{key} reaches Completed; DELETE accepted") {
    val out = tmpDir("jobapi_out")
    val cfg =
      s"""{"jobId":"api-orders-01",
         |"source":{"type":"PARQUET","connectionDetails":{"path":"$sf/orders.parquet",
         |  "filter":"o_orderstatus = 'F'"}},
         |"destination":{"type":"PARQUET","connectionDetails":{"path":"$out/orders"}},
         |"mappings":[
         |  {"sourceFieldName":"o_orderkey","destinationFieldName":"OrderID","destFieldType":"LONG"},
         |  {"sourceFieldName":"o_totalprice","destinationFieldName":"Total","destFieldType":"DOUBLE"}]}""".stripMargin
    val api = new JobApi(spark)
    val port = api.start()
    try {
      val base = s"http://127.0.0.1:$port/jobs"
      val sub = post(base, cfg)
      assert(sub.statusCode() == 202, sub.body())
      val key = """"configKey":"([^"]+)"""".r
        .findFirstMatchIn(sub.body()).map(_.group(1))
        .getOrElse(fail(s"no configKey in ${sub.body()}"))
      // poll to completion (Pending -> Running -> Completed)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var last = ""
      while (!last.contains("\"Completed\"") && System.nanoTime() < deadline) {
        val r = get(s"$base/$key")
        assert(r.statusCode() == 200, r.body())
        last = r.body()
        if (!last.contains("\"Completed\"")) Thread.sleep(200)
      }
      assert(last.contains("\"status\":\"Completed\""), last)
      val expected = Tables.t(spark, sf, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F").count()
      assert(last.contains(s""""recordsWritten":$expected"""), last)
      assert(spark.read.parquet(s"$out/orders").count() == expected)
      // unknown key -> 404; cancel is always accepted (cooperative)
      assert(get(s"$base/nope::x::0").statusCode() == 404)
      assert(delete(s"$base/$key").statusCode() == 202)
      // malformed config -> 400, not a crash
      assert(post(base, "{not json").statusCode() == 400)
    } finally api.stop()
  }
}
