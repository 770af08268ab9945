package graft.sinks

/** K2's retry policy (reference `Leyton_depot.py:476-483`): up to
  * `maxAttempts` tries with linear backoff `1.2·(attempt+1)` seconds;
  * the final failure is rethrown. `sleep` is injectable so tests (and
  * backpressure-aware callers) don't wall-clock wait.
  */
object Retry {
  val DefaultAttempts = 3

  def defaultBackoffMs(attempt: Int): Long = (1.2 * (attempt + 1) * 1000).toLong

  def withRetry[T](maxAttempts: Int = DefaultAttempts,
                   backoffMs: Int => Long = defaultBackoffMs,
                   sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f())
      catch {
        case e: Exception =>
          if (attempt >= maxAttempts - 1) throw e
          sleep(backoffMs(attempt))
          attempt += 1
      }
    }
    out.get
  }
}
