package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Retry

class RetrySpec extends AnyFunSuite {

  test("flaky source succeeds on the retry, with backoff invoked per failure") {
    var calls = 0
    val seen = scala.collection.mutable.ListBuffer[Int]()
    val out = Retry.withBackoff(attempts = 3, baseDelayMs = 1L,
      onRetry = (i, _) => seen += i) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"connect refused #$calls")
      "connected"
    }
    assert(out == "connected" && calls == 3 && seen.toList == List(1, 2))
  }

  test("exhausted attempts rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(attempts = 2, baseDelayMs = 1L) {
        calls += 1; throw new RuntimeException(s"still down #$calls")
      }
    }
    assert(calls == 2 && e.getMessage == "still down #2")
  }

  test("Errors are not retried") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withBackoff(attempts = 3, baseDelayMs = 1L) {
        calls += 1; throw new OutOfMemoryError("boom")
      }
    }
    assert(calls == 1)
  }
}
