package graft.operators

/** Overlap INDEPENDENT Spark jobs from a bounded driver-side pool —
  * the optimization-guide §2.6 lever: actions are only sequential
  * because driver code calls them sequentially, so ladder/panel
  * queries (tune rungs, recall panels, the OPQ coupling ladder, the
  * keeper's CC ∥ PageRank pair) were serializing jobs whose stages
  * mostly idle the executor pool at their tails. Submitting them from
  * a few driver threads lets the next job's tasks back-fill the
  * current job's straggler tail. FIFO scheduling (the default) keeps
  * the earlier task resource-preferred — exactly the back-fill
  * behaviour the guide prescribes.
  *
  * Results return IN INPUT ORDER (never completion order), so callers
  * stay deterministic. Parallelism is a small constant: enough to
  * fill tails, not enough to thrash the scheduler — and it bounds
  * DRIVER-side concurrency only; per-job cluster parallelism is
  * unchanged.
  */
object Concurrent {
  def par[A](tasks: Seq[() => A], parallelism: Int = 4): Seq[A] = {
    if (tasks.lengthCompare(1) <= 0) return tasks.map(_())
    // daemon threads: a hung task cannot pin the JVM past main's exit
    // (r14 ADVICE); Spark actions on these threads respond to interrupt
    // via job cancellation, so cancel-on-failure below is effective
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      // unwrap so callers see the task's own exception, not the
      // ExecutionException shell; on the FIRST failure cancel the
      // rest of the batch (r14 ADVICE: don't keep burning the pool on
      // jobs whose result the caller will never read)
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            futs.foreach(_.cancel(true))
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
