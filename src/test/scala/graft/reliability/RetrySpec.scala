package graft.reliability

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  private def policy(maxAttempts: Int = 3) = RetryPolicy(
    maxAttempts = maxAttempts,
    initialIntervalMs = 100,
    jitterFraction = () => 0.5, // deterministic mid-point jitter = no-op
    sleep = _ => ())            // never actually sleep in tests

  test("succeeds after transient failures") {
    var calls = 0
    val out = Retry.execute(policy()) { () =>
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky")
      "ok"
    }
    assert(out === "ok" && calls === 3)
  }

  test("exhausts after maxAttempts (ref: 3 attempts incl. first)") {
    var calls = 0
    val e = intercept[Retry.Exhausted] {
      Retry.execute(policy()) { () => calls += 1; throw new RuntimeException("down") }
    }
    assert(calls === 3 && e.attempts === 3)
    assert(e.getMessage.contains("failed after 3 attempts"))
  }

  test("non-retryable short-circuits (ref NewNonRetryableError)") {
    var calls = 0
    intercept[NonRetryableException] {
      Retry.execute(policy()) { () => calls += 1; throw new NonRetryableException("bad data") }
    }
    assert(calls === 1)
  }

  test("backoff: exponential, capped, jittered ±25% (ref retry.go:205-223)") {
    val p = RetryPolicy(initialIntervalMs = 1000, maxIntervalMs = 30000,
      multiplier = 2.0, jitter = false)
    assert(Retry.backoffMs(p, 1) === 1000)
    assert(Retry.backoffMs(p, 2) === 2000)
    assert(Retry.backoffMs(p, 3) === 4000)
    assert(Retry.backoffMs(p, 10) === 30000) // cap
    val low = p.copy(jitter = true, jitterFraction = () => 0.0)
    val high = p.copy(jitter = true, jitterFraction = () => 1.0)
    assert(Retry.backoffMs(low, 1) === 750)   // -25%
    assert(Retry.backoffMs(high, 1) === 1250) // +25%
  }

  test("error classification for DLQ (ref deadletter.go error types)") {
    assert(DeadLetter.classify(new NonRetryableException("x")) === DeadLetter.ErrorType.Permanent)
    assert(DeadLetter.classify(new IllegalArgumentException("x")) === DeadLetter.ErrorType.Validation)
    assert(DeadLetter.classify(new java.io.IOException("x")) === DeadLetter.ErrorType.Transient)
    assert(DeadLetter.classify(new RuntimeException("x")) === DeadLetter.ErrorType.Unknown)
    assert(DeadLetter.classify(
      Retry.Exhausted(3, new java.io.IOException("x"))) === DeadLetter.ErrorType.Transient)
  }
}
