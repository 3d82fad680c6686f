package graft.util

/** Overlap INDEPENDENT driver-side jobs (guide §2.6): several operators
  * compose 2-3 independent eager legs (localCheckpointed pair generators,
  * iterative connected-components loops, eval truth legs) and Spark only
  * runs them sequentially because the driver calls them sequentially.
  * Running each leg on its own driver thread lets the next leg's tasks
  * back-fill executor cores freed by the current leg's straggler tail —
  * pure wall-clock win, identical results (each leg is deterministic and
  * independent), same total CPU.
  *
  * Scheduling is the session's default FIFO: the earlier leg gets cores
  * first and later legs use what is left — exactly the back-fill behavior
  * wanted on a shared local[N] box. Failures propagate: the FIRST leg
  * error (by input order) is rethrown after all threads finish, so no
  * half-constructed plan escapes.
  */
object Par {

  /** Run the thunks on daemon driver threads; return results in input
    * order. Blocks until every thunk finishes. */
  def run[T](fs: Seq[() => T]): Seq[T] = {
    if (fs.lengthCompare(1) <= 0) return fs.map(f => f())
    val results = new Array[Any](fs.length)
    val errors = new Array[Throwable](fs.length)
    val threads = fs.zipWithIndex.map { case (f, i) =>
      val t = new Thread(() => {
        try results(i) = f()
        catch { case e: Throwable => errors(i) = e }
      }, s"graft-par-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    errors.find(_ != null).foreach(e => throw e)
    results.toSeq.asInstanceOf[Seq[T]]
  }

  /** Two-leg convenience: `(a, b)` built concurrently. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val r = run[Any](Seq(a, b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
