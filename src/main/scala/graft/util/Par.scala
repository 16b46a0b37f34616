package graft.util

/** Overlap INDEPENDENT Spark actions from a small driver-side pool
  * (optimization guide §2.6: actions are only sequential because the
  * driver calls them sequentially — submitting independent jobs
  * concurrently lets the next job's tasks back-fill the slots the
  * current one's tail leaves idle). Used where a store operation's
  * pieces are genuinely independent: multi-table staging writes inside
  * one journaled commit, multi-table store inits, and the corpusBatch
  * family dispatch (whose apply order across stores is documented
  * order-free).
  *
  * Semantics: run every thunk, wait for all, rethrow the FIRST failure
  * (after all have settled, so no thunk is abandoned mid-write with a
  * sibling still mutating the same store's staging area). Falls back to
  * sequential execution for 0/1 thunks.
  *
  * Thread notes: the pool threads are daemons; Spark's SparkContext
  * local properties (job description/group) are inherited at thread
  * CREATION, so labels set later by callers may not propagate —
  * cosmetic only. Callers must hand thunks whose DataFrames were
  * CONSTRUCTED on the caller thread when a thread-local SQLConf
  * override (GraftSqlShim.withConfOverrides) matters: analysis happens
  * at construction; execution inside the pool reads the session conf.
  */
private[graft] object Par {

  // Bounded: 2-3 concurrent actions fill a local slot's tail nicely
  // (guide §2.6's "2-3 jobs in flight is plenty"); more just contend.
  private val PoolName = "graft-par-"
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    math.min(3, math.max(2, Runtime.getRuntime.availableProcessors() / 4)),
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$PoolName${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  def run[T](thunks: Seq[() => T]): Seq[T] =
    // NESTED calls (a parallel store continuation whose commit itself
    // parallelizes its staging writes) run INLINE: blocking a fixed
    // pool thread on futures served by the same pool is a starvation
    // deadlock waiting for the right pool size to find it
    if (thunks.sizeIs <= 1 ||
        Thread.currentThread().getName.startsWith(PoolName))
      thunks.map(_.apply())
    else {
      val futures = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, T]] {
          def call(): Either[Throwable, T] =
            try Right(t()) catch { case e: Throwable => Left(e) }
        }))
      val results = futures.map(_.get())
      results.collectFirst { case Left(e) => e }.foreach(throw _)
      results.collect { case Right(v) => v }
    }

  /** [[run]] for side-effecting thunks. */
  def foreach(thunks: Seq[() => Unit]): Unit = { run(thunks); () }
}
