package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class FetcherSpec extends AnyFunSuite {

  /** Scripted fetcher: returns responses in sequence per call. */
  private class Scripted(responses: Either[Int, String]*) extends Fetcher {
    var calls = 0
    override def fetch(url: String): Either[Int, String] = {
      val r = responses(math.min(calls, responses.length - 1)); calls += 1; r
    }
  }

  test("retries retryable statuses with doubling backoff, then succeeds") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val inner = new Scripted(Left(429), Left(503), Right("ok"))
    val f = RetryingFetcher(inner, maxRetries = 3, baseBackoffMs = 2000,
                            sleeper = sleeps.append(_))
    assert(f.fetch("u") == Right("ok"))
    assert(inner.calls == 3)
    assert(sleeps.toSeq == Seq(2000L, 4000L))
  }

  test("fails fast on non-retryable status") {
    val inner = new Scripted(Left(404))
    val f = RetryingFetcher(inner, maxRetries = 3, sleeper = _ => ())
    assert(f.fetch("u") == Left(404))
    assert(inner.calls == 1)
  }

  test("gives up after maxRetries on persistent retryable failure") {
    val inner = new Scripted(Left(500))
    val f = RetryingFetcher(inner, maxRetries = 3, sleeper = _ => ())
    assert(f.fetch("u") == Left(500))
    assert(inner.calls == 3)
  }

  test("exceptions count as retryable") {
    val inner = new Fetcher {
      var calls = 0
      override def fetch(url: String): Either[Int, String] = {
        calls += 1
        if (calls < 2) throw new RuntimeException("boom") else Right("ok")
      }
    }
    val f = RetryingFetcher(inner, maxRetries = 3, sleeper = _ => ())
    assert(f.fetch("u") == Right("ok"))
  }

  test("rate limiter enforces the minimum gap between requests") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var now = 0L
    val inner = new Scripted(Right("a"), Right("b"), Right("c"))
    val f = RateLimitedFetcher(inner, minDelayMs = 1000,
      sleeper = sleeps.append(_), clock = () => now)
    f.fetch("u1")            // first call: no wait
    now += 300
    f.fetch("u2")            // 300ms elapsed -> sleep 700
    now += 1500
    f.fetch("u3")            // 1500ms elapsed -> no sleep
    assert(sleeps.toSeq === Seq(700L))
    assert(inner.calls === 3)
  }
}
