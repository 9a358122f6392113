package graft.reliability

import scala.annotation.tailrec
import scala.util.control.NonFatal

/** Sink-side retry with exponential backoff and jitter.
  *
  * Mirrors the reference's retry policy (ref internal/cdc/pipeline/
  * retry.go:34-223: 3 attempts, 1 s initial, 30 s cap, ×2 multiplier,
  * ±25% jitter, non-retryable classification short-circuits).
  *
  * Scope note: Spark already retries TASKS (`spark.task.maxFailures`) and
  * restarts streaming queries; this wrapper exists for the sink/commit
  * level inside `foreachBatch`, where a whole micro-batch write either
  * succeeds or is retried/dead-lettered as a unit — the reference's batch
  * processor semantics (ref internal/cdc/buffer/batch.go:215-285).
  */
final case class RetryPolicy(
    maxAttempts: Int = 3,
    initialIntervalMs: Long = 1000L,
    maxIntervalMs: Long = 30000L,
    multiplier: Double = 2.0,
    jitter: Boolean = true,
    // injectable for determinism in tests; production uses the default RNG
    jitterFraction: () => Double = () => scala.util.Random.nextDouble(),
    sleep: Long => Unit = Thread.sleep)

/** Marks an error as not worth retrying (ref RetryableError,
  * retry.go:59-91). */
final class NonRetryableException(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

object Retry {

  final case class Exhausted(attempts: Int, last: Throwable)
    extends RuntimeException(s"failed after $attempts attempts: ${last.getMessage}", last)

  /** Backoff for attempt n (1-based): initial * multiplier^(n-1), capped,
    * ±25% jitter (ref retry.go:205-223). */
  def backoffMs(policy: RetryPolicy, attempt: Int): Long = {
    val base = policy.initialIntervalMs * math.pow(policy.multiplier, (attempt - 1).toDouble)
    val capped = math.min(base, policy.maxIntervalMs.toDouble)
    val jittered =
      if (policy.jitter) capped * (0.75 + 0.5 * policy.jitterFraction())
      else capped
    math.max(0L, jittered.toLong)
  }

  /** Run `op`, retrying on retryable failure. Returns the first success or
    * throws [[Exhausted]] wrapping the last error; a
    * [[NonRetryableException]] is rethrown immediately. */
  def execute[A](policy: RetryPolicy = RetryPolicy())(op: () => A): A = {
    @tailrec
    def loop(attempt: Int): A = {
      val result =
        try Right(op())
        catch {
          case e: NonRetryableException => throw e
          case NonFatal(e)              => Left(e)
        }
      result match {
        case Right(a) => a
        case Left(e) if attempt >= policy.maxAttempts => throw Exhausted(attempt, e)
        case Left(_) =>
          policy.sleep(backoffMs(policy, attempt))
          loop(attempt + 1)
      }
    }
    loop(1)
  }
}
