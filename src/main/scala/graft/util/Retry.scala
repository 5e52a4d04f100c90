package graft.util

/** Bounded retry with linear backoff — parity with the reference's DB
  * connect loop (utils/MySQLWrapper.py:34-41: 3 attempts, `i * 5 s`
  * sleep). Used around driver-side JDBC connects (schema probe) and
  * executor-side connection acquisition; NOT around whole Spark jobs —
  * task re-execution is Spark's own retry layer.
  *
  * Only `Exception`s are retried (connection refused, transient DB
  * states); `Error`s propagate immediately.
  */
object Retry {

  /** Run `f`, retrying up to `attempts` times total; attempt `i`
    * (1-based) sleeps `i * baseDelayMs` before retrying. Rethrows the
    * last failure with the attempt count in the message chain.
    */
  def withBackoff[T](attempts: Int = 3, baseDelayMs: Long = 5000L,
                     onRetry: (Int, Exception) => Unit = (_, _) => ())(f: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var i = 1
    while (true) {
      try return f
      catch {
        case e: Exception if i < attempts =>
          onRetry(i, e)
          Thread.sleep(i * baseDelayMs)
          i += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
