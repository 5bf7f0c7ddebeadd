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
 *  - a config is CLAIMED (atomic move to processing/) before parsing —
 *    concurrent consumers race on the claim, exactly one wins — and
 *    "acked" (moved to done/) only AFTER the job ran and reported; a
 *    crash mid-job leaves the claim in processing/, requeued at the
 *    next consumer start (at-least-once);
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
  private val processingP = inboxP.resolve("processing")
  Files.createDirectories(doneP)
  Files.createDirectories(failedP)
  Files.createDirectories(processingP)
  // Crash recovery (at-least-once): configs claimed by a previous run
  // of THIS consumer process that died mid-job go back to the inbox
  // for redelivery. Safe at construction — live claims only exist
  // within the current process.
  locally {
    val stale = Files.list(processingP)
    try stale.iterator().asScala.filter(Files.isRegularFile(_)).foreach { s =>
      Files.move(s, inboxP.resolve(s.getFileName), StandardCopyOption.REPLACE_EXISTING)
    } finally stale.close()
  }
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
    // CLAIM first with an atomic move: when several consumer threads
    // share this inbox, exactly one wins each file — the loser's move
    // throws and it just skips, instead of double-running the job or
    // DLQ-ing a file that already succeeded.
    val claimed = processingP.resolve(p.getFileName)
    try Files.move(p, claimed, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.FileSystemException => return None // claimed by another consumer
    }
    val cfg = try JobConfig.fromFile(claimed.toString) catch {
      case NonFatal(e) =>
        // Poison message -> DLQ with reason; never block the queue.
        Files.writeString(failedP.resolve(p.getFileName.toString + ".error"),
          s"parse error: ${e.getMessage}")
        Files.move(claimed, failedP.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
        return None
    }
    if (running.putIfAbsent(cfg.jobId, true) != null) {
      // duplicate running jobId: release the claim for redelivery
      // after the in-flight instance finishes
      Files.move(claimed, p, StandardCopyOption.REPLACE_EXISTING)
      return None
    }
    try {
      val res = JobRunner.run(spark, cfg, notifier)
      val target = res.status match {
        case JobRunner.Completed => doneP
        case _ =>
          Files.writeString(failedP.resolve(p.getFileName.toString + ".error"), res.message)
          failedP
      }
      // ack-after-run: the move is the acknowledgement
      Files.move(claimed, target.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
      Some(res)
    } finally running.remove(cfg.jobId)
  }
}
