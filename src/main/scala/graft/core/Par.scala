package graft.core

/** Overlap INDEPENDENT driver actions (guide §2.6): Spark's scheduler
  * happily runs several jobs at once inside one application — actions are
  * only sequential because driver code calls them sequentially. Composite
  * builds here (multi-table commits, store audits, index bootstraps) run
  * several jobs whose inputs don't depend on each other; submitting them
  * from separate threads lets the tail of one job back-fill the cores the
  * next job's tasks would otherwise wait for. This is a wall-clock win at
  * ANY core count and ANY scale — on a cluster the same overlap fills
  * executor idle time — not a local[32] tune.
  *
  * Scope rules (why this is safe where it is used):
  *   - only thunks with NO data dependency on each other are passed in;
  *   - thunks that WRITE only ever write disjoint store paths;
  *   - streaming replays are never parallelized (withPinnedReplay pins
  *     session-global conf and is serialized by its own lock).
  */
object Par {
  /** Cached daemon pool: sized by demand (concurrent thunk counts here
    * are 2-7), never blocks JVM exit, and nested Par.run calls cannot
    * deadlock the way a small fixed pool could.
    */
  private lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    })

  /** Run the thunks concurrently, return their results in order.
    * Propagates the FIRST failure (others are awaited so no job leaks
    * past the call). A single thunk short-circuits to a plain call.
    */
  def run[T](thunks: (() => T)*): Seq[T] = {
    if (thunks.sizeIs <= 1) return thunks.map(_()).toSeq
    val futures = thunks.map(t =>
      pool.submit(new java.util.concurrent.Callable[T] {
        override def call(): T = t()
      }))
    // await ALL before surfacing a failure: a thrown-through thunk must
    // not leave siblings running against stores the caller may delete
    val results = futures.map(f =>
      try Right(f.get())
      catch {
        case e: java.util.concurrent.ExecutionException =>
          Left(Option(e.getCause).getOrElse(e))
        case e: Throwable => Left(e)
      })
    results.collectFirst { case Left(e) => e }.foreach(e => throw e)
    results.collect { case Right(v) => v }
  }

  /** Fire-and-join-later: start `body` on the pool now, return a join
    * function that blocks for (and re-throws from) it. For overlapping a
    * side computation with a longer inline chain when Par.run's
    * all-at-once shape doesn't fit.
    */
  def async[T](body: => T): () => T = {
    val f = pool.submit(new java.util.concurrent.Callable[T] {
      override def call(): T = body
    })
    () => try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }

  /** Two-result convenience with precise types. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val rs = run[Any](
      a.asInstanceOf[() => Any], b.asInstanceOf[() => Any])
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }
}
