package graft.job

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.JobConfig
import org.apache.spark.sql.SparkSession

/**
 * HTTP control plane over [[JobRunner]] — parity with the reference
 * workflow engine's REST API (workflowEngine-part1.java:493-586:
 * submit / status / cancel endpoints). CONTROL plane only: job
 * configs and statuses ride HTTP; the data itself moves through
 * Spark's own sources and sinks.
 *
 *   POST   /jobs            body = JobConfig JSON → 202 {configKey}
 *   GET    /jobs/{key}      → 200 status JSON (+ progressPercent
 *                             when metrics are attached) | 404
 *   DELETE /jobs/{key}      → 202 (cooperative cancel via job group)
 *
 * Built on the JDK's com.sun.net.httpserver (no added dependency —
 * the same move as the REST sink's pluggable transport). Binds
 * loopback; production fronting (auth, TLS) is the deployment's job.
 */
final class JobApi(spark: SparkSession, port: Int = 0, poolSize: Int = 4) {

  private val pool = Executors.newFixedThreadPool(poolSize)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/jobs", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch {
        case e: Throwable =>
          respond(ex, 400, s"""{"error":${JobApi.jstr(Option(e.getMessage).getOrElse("bad request"))}}""")
      } finally ex.close()
  })
  server.setExecutor(null) // serve on the accept thread; jobs run on `pool`

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    (ex.getRequestMethod, path) match {
      case ("POST", "/jobs") =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val cfg = JobConfig.fromJson(body)
        val key = JobRunner.submitAsync(spark, cfg, pool)
        respond(ex, 202,
          s"""{"jobId":${JobApi.jstr(cfg.jobId)},"configKey":${JobApi.jstr(key)},"status":"Pending"}""")
      case ("GET", p) if p.startsWith("/jobs/") =>
        val key = p.stripPrefix("/jobs/")
        JobRunner.status(key) match {
          case None => respond(ex, 404, s"""{"error":"unknown configKey"}""")
          case Some(r) =>
            val prog = JobRunner.progress(key)
              .map(v => s""","progressPercent":${"%.1f".formatLocal(java.util.Locale.ROOT, v)}""")
              .getOrElse("")
            respond(ex, 200, JobApi.resultJson(r, prog))
        }
      case ("DELETE", p) if p.startsWith("/jobs/") =>
        val key = p.stripPrefix("/jobs/")
        JobRunner.cancel(spark, key)
        respond(ex, 202, s"""{"configKey":${JobApi.jstr(key)},"cancelRequested":true}""")
      case (m, p) =>
        respond(ex, 405, s"""{"error":"no route ${JobApi.jstr(s"$m $p").drop(1).dropRight(1)}"}""")
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }
}

object JobApi {
  private[job] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private[job] def statusName(s: JobRunner.JobStatus): String = s match {
    case JobRunner.Failed(_) => "Failed"
    case other => other.toString
  }

  private[job] def resultJson(r: JobRunner.JobResult, extra: String = ""): String =
    s"""{"jobId":${jstr(r.jobId)},"configKey":${jstr(r.configKey)},""" +
      s""""status":"${statusName(r.status)}","recordsWritten":${r.recordsWritten},""" +
      s""""recordsFailed":${r.recordsFailed},"message":${jstr(r.message)}$extra}"""
}
