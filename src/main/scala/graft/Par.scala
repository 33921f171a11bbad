package graft

/** Overlap INDEPENDENT Spark actions inside one declared query (guide
  * §2.6, "overlap independent jobs"): Spark's scheduler runs concurrent
  * jobs happily — actions are only sequential because driver code calls
  * them sequentially — and an audit-style query whose body needs k
  * bounded numbers (exact pair count, capped pair count, postings
  * histogram) otherwise serializes k full job DAGs while most of the
  * session's cores idle in each job's straggler tail. Each thunk runs on
  * a fresh thread; Spark's job-scoped local properties (job description
  * / group) are InheritableThreadLocal, so child jobs keep the caller's
  * bench label. Overlap changes SCHEDULING only, never data: each
  * action's result is byte-identical to its sequential run, and the
  * tuple preserves call order. The first failure rethrows on the caller
  * thread (the loud-failure bench contract). Threads are one-shot and
  * joined before return — no pool outlives the call, nothing leaks into
  * a long-lived session. */
object Par {
  def par2[A, B](a: => A, b: => B): (A, B) = {
    val out = run(Seq(() => a, () => b))
    (out(0).asInstanceOf[A], out(1).asInstanceOf[B])
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val out = run(Seq(() => a, () => b, () => c))
    (out(0).asInstanceOf[A], out(1).asInstanceOf[B], out(2).asInstanceOf[C])
  }

  private def run(thunks: Seq[() => Any]): Seq[Any] = {
    val results = new Array[Any](thunks.length)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(
        () => try results(i) = t()
        catch { case e: Throwable => err.compareAndSet(null, e); () },
        s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (err.get() != null) throw err.get()
    results.toIndexedSeq
  }
}
