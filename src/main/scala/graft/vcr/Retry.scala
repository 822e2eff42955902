package graft.vcr

/** Exponential backoff retry: 1s·2^n sleeps, capped so the final sleep
  * never overshoots the deadline; non-matching throwables rethrow;
  * returns None on timeout (reference: ExponentialBackoffRunner.java).
  */
object Retry {
  def withBackoff[T](task: () => T,
                     retryOn: Throwable => Boolean,
                     timeoutMillis: Long,
                     clock: () => Long = () => System.currentTimeMillis(),
                     sleep: Long => Unit = Thread.sleep): Option[T] = {
    val endTime = clock() + timeoutMillis
    var n = 0
    while (clock() < endTime) {
      try return Some(task())
      catch {
        case e: Throwable if retryOn(e) =>
          var sleepTime = 1000L * (1L << n)
          if (clock() + sleepTime >= endTime)
            sleepTime = math.max(endTime - clock(), 1L)
          sleep(sleepTime)
          n += 1
      }
    }
    None
  }
}
