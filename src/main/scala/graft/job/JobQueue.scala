package graft.job

import graft.model.JobConfig
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/**
 * Control-plane trigger loop: one queue message = one batch job.
 *
 * The reference consumes job configs from Oracle AQ / Kafka with
 * ack-after-launch, at-least-once semantics
 * (OracleAQListener.java:38-111, workflowEngine-part1.java:117-156).
 * This is the same state machine over a directory queue — the broker
 * adapter is swappable, the semantics are what matter:
 *
 *  - a config is "acked" (moved to done/) only AFTER the job ran and
 *    reported; a crash mid-job leaves it in the inbox for redelivery;
 *  - a config that fails parsing or the job fails goes to failed/
 *    (the DLQ analog) with the error message alongside;
 *  - a jobId already running is skipped (matters when several queue
 *    consumers share this instance — within one sequential drain each
 *    job completes before the next is examined, mirroring the
 *    reference's running-check, workflowEngine-part1.java:261-267).
 */
final class JobQueue(spark: SparkSession, inbox: String,
                     notifier: JobRunner.Notifier = JobRunner.LogNotifier) {

  private val inboxP = Paths.get(inbox)
  private val doneP = inboxP.resolve("done")
  private val failedP = inboxP.resolve("failed")
  Files.createDirectories(doneP)
  Files.createDirectories(failedP)
  private val running = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Process every pending config once; returns per-file results.
    * Call in a loop (or from a scheduler) for continuous consumption. */
  def drainOnce(): Map[String, JobRunner.JobResult] = {
    val listing = Files.list(inboxP)
    val pending = try listing.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".json"))
      .toList.sortBy(_.getFileName.toString)
    finally listing.close()
    pending.flatMap { p => process(p).map(p.getFileName.toString -> _) }.toMap
  }

  private def process(p: Path): Option[JobRunner.JobResult] = {
    val cfg = try JobConfig.fromFile(p.toString) catch {
      case NonFatal(e) =>
        // Poison message -> DLQ with reason; never block the queue.
        Files.writeString(failedP.resolve(p.getFileName.toString + ".error"),
          s"parse error: ${e.getMessage}")
        Files.move(p, failedP.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
        return None
    }
    if (running.putIfAbsent(cfg.jobId, true) != null) return None // duplicate running jobId
    try {
      val res = JobRunner.run(spark, cfg, notifier)
      val target = res.status match {
        case JobRunner.Completed => doneP
        case _ =>
          Files.writeString(failedP.resolve(p.getFileName.toString + ".error"), res.message)
          failedP
      }
      // ack-after-run: the move is the acknowledgement
      Files.move(p, target.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
      Some(res)
    } finally running.remove(cfg.jobId)
  }
}
