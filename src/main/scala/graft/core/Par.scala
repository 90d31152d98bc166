package graft.core

/** Overlap INDEPENDENT Spark jobs from a bounded driver pool (the
  * optimization-guide §2.6 pattern: the scheduler happily runs several
  * jobs at once inside one application; actions are only sequential
  * because driver code calls them sequentially — FIFO scheduling
  * back-fills one job's task tail with the next job's tasks).
  *
  * Use ONLY for jobs with no data or filesystem-path dependency on each
  * other (e.g. writing two disjoint staging directories). Failures
  * propagate: the first thrown exception rethrows after all branches
  * settle, so no branch is silently abandoned mid-write.
  */
object Par {
  def jobs(bodies: (() => Unit)*): Unit = {
    require(bodies.nonEmpty)
    if (bodies.size == 1) { bodies.head.apply(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(bodies.size, 4))
    try {
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val fs = bodies.map(b => scala.concurrent.Future(b())(ec))
      // await ALL (collecting the first failure) rather than failing fast:
      // an abandoned concurrent write could otherwise race a caller's
      // cleanup of the same directory tree
      val results = fs.map(f =>
        scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf).value.get)
      results.collectFirst { case scala.util.Failure(e) => throw e }
      ()
    } finally pool.shutdown()
  }
}
