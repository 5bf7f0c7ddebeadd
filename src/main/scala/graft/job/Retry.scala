package graft.job

import scala.util.control.NonFatal

/**
 * Driver-side retry with exponential backoff (reference E4:
 * `writeBatchWithRetry`, ETLCoreMainJobExecution.java:184-221 —
 * 3 attempts, 1s * 2^(n-1) delay, retry only transient failures with
 * one-level cause unwrap, :229-249).
 *
 * Inside Spark, task-level failures already retry via
 * `spark.task.maxFailures`; this wrapper is for DRIVER-side actions
 * that sit outside task retry — a whole `df.write` against a flaky
 * endpoint, a JDBC TRUNCATE, a notification call. JDBC writes remain
 * at-least-once under retry, exactly as in the reference (which
 * re-sends the whole batch too — SURVEY.md §7.4.4).
 */
object Retry {

  def isTransient(e: Throwable): Boolean = e match {
    case null => false
    case _: java.io.IOException => true
    case _: java.sql.SQLTransientException => true
    case _: java.net.SocketException => true
    case e if e.getCause != null && e.getCause != e => isTransientCause(e.getCause)
    case _ => false
  }
  // one-level cause unwrap, like the reference (:241-246)
  private def isTransientCause(c: Throwable): Boolean = c match {
    case _: java.io.IOException => true
    case _: java.sql.SQLTransientException => true
    case _: java.net.SocketException => true
    case _ => false
  }

  /** Run `op`, retrying transient failures up to `attempts` times with
    * `baseDelayMs * 2^(n-1)` backoff. Non-transient failures and the
    * final attempt's failure propagate. */
  def withRetry[T](attempts: Int = 3, baseDelayMs: Long = 1000,
                   sleep: Long => Unit = Thread.sleep)(op: () => T): T = {
    var n = 0
    while (true) {
      n += 1
      try return op()
      catch {
        case NonFatal(e) if n < attempts && isTransient(e) =>
          val delay = baseDelayMs * (1L << (n - 1))
          System.err.println(s"[graft-retry] attempt $n failed (${e.getClass.getSimpleName}: ${e.getMessage}); retrying in ${delay}ms")
          sleep(delay)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
