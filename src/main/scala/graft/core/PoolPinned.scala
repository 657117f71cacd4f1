package graft.core

import org.apache.spark.SparkContext

import scala.concurrent.{ExecutionContext, Future}

/** Scheduler-pool-safe task fan-out.
  *
  * `spark.scheduler.pool` is a thread-local property that worker threads
  * inherit as an InheritableThreadLocal SNAPSHOT taken when the thread is
  * CREATED. A shared executor (`ExecutionContext.global`, a lazily-grown
  * pool) therefore tags each worker with whatever pool the thread that
  * happened to trigger its creation carried: a worker first created while
  * a background rebuild was submitting lands every LATER submission —
  * including foreground request-path commit writes — in the weight-1
  * `graftRebuild` pool, and conversely rebuild writes can escape into the
  * default pool, nondeterministically inverting the 4:1 fair-scheduler
  * priority the pool exists to enforce.
  *
  * [[future]] captures the SUBMITTING thread's pool at call time, pins it
  * inside the task body, and clears it after — pool routing follows the
  * submission, never the accident of worker-creation order. Under FIFO
  * scheduler mode (tests) the property is ignored by Spark, so pinning is
  * semantics-free there.
  */
object PoolPinned {
  private val PoolKey = "spark.scheduler.pool"

  /** `Future(body)` with the caller's scheduler pool carried onto whichever
    * worker runs it. The property is cleared (not restored) in the finally:
    * these workers are shared, and every pinned submission sets its own —
    * a cleared worker defaults to the default pool, which is exactly what
    * an UNpinned legacy submission should get.
    */
  def future[T](sc: SparkContext)(body: => T)(
      implicit ec: ExecutionContext): Future[T] = {
    val pool = sc.getLocalProperty(PoolKey)
    Future {
      sc.setLocalProperty(PoolKey, pool)
      try body
      finally sc.setLocalProperty(PoolKey, null)
    }
  }
}
