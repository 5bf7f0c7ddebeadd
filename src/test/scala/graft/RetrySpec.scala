package graft

import graft.job.Retry
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("transient failures retry with exponential backoff, then succeed") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Retry.withRetry(attempts = 3, baseDelayMs = 100, sleep = delays += _) { () =>
      calls += 1
      if (calls < 3) throw new java.io.IOException(s"flaky $calls")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    assert(delays.toSeq == Seq(100L, 200L)) // 1x, 2x base
  }

  test("non-transient failure propagates immediately") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withRetry(attempts = 3, sleep = _ => ()) { () =>
        calls += 1; throw new IllegalArgumentException("bad config")
      }
    }
    assert(calls == 1)
  }

  test("attempts exhausted -> last transient error propagates") {
    var calls = 0
    intercept[java.io.IOException] {
      Retry.withRetry(attempts = 3, sleep = _ => ()) { () =>
        calls += 1; throw new java.io.IOException("always down")
      }
    }
    assert(calls == 3)
  }

  test("one-level cause unwrap classifies wrapped transient errors") {
    assert(Retry.isTransient(new RuntimeException(new java.net.SocketException("reset"))))
    assert(!Retry.isTransient(new RuntimeException(new IllegalStateException("logic"))))
  }
}
