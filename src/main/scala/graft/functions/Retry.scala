package graft.functions

import scala.util.control.NonFatal

/** Bounded retry for driver-side metadata operations (the reference's
  * `utils/retry.py:7-18`; deviation per SURVEY §8.21 — after exhausting
  * attempts the last failure is RETHROWN, never swallowed to `None`).
  * Task-level retries inside jobs are Spark-native; this wraps
  * catalog/sink operations on the driver.
  */
object Retry {
  def apply[T](attempts: Int, backoffMs: Long = 100L)(op: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var remaining = attempts
    var delay = backoffMs
    while (true) {
      try return op
      catch {
        case NonFatal(e) =>
          remaining -= 1
          if (remaining == 0) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
