package graft.api

/** Remaining service-shell parity pieces (reference facade, not engine):
  * the transaction manager's multi-step rollback
  * (`/root/reference/app/modules/transaction_manager.py:24-170`), the
  * metrics middleware's per-endpoint timing store + slow-request detection
  * (`app/middleware/metrics.py:20-90`), and the health service's
  * component-status aggregation (`app/services/health_service.py:33-73`).
  * Driver-local like the originals; no Spark.
  */
object ServiceShell {

  /** A sequence of operations with per-operation undo, executed in order;
    * on the first failure, previously executed operations roll back in
    * REVERSE order and the failure rethrows (`transaction_manager.py:
    * 123-152`). Rollback errors are contained per operation — one broken
    * undo must not stop the rest (`transaction_manager.py:153-166`).
    * The reference wires this around multi-step tenant setup
    * (db + collection + user + role + grants, `base_milvus.py:1479-1524`);
    * the catalog analogue is generateSchema + createUser.
    */
  final class Transaction(val name: String) {
    private final case class Op(run: () => Any, undo: Any => Unit)
    private val ops = scala.collection.mutable.ArrayBuffer.empty[Op]
    private val executed = scala.collection.mutable.ArrayBuffer.empty[(Op, Any)]
    private var completed = false

    def add(run: () => Any, undo: Any => Unit = _ => ()): this.type = {
      ops += Op(run, undo); this
    }

    /** Results of every operation; throws the first failure AFTER rolling
      * back what already ran.
      */
    def execute(): Seq[Any] = {
      val results = scala.collection.mutable.ArrayBuffer.empty[Any]
      for (op <- ops) {
        val r =
          try op.run()
          catch { case e: Throwable => rollbackExecuted(); throw e }
        executed += ((op, r))
        results += r
      }
      completed = true
      results.toSeq
    }

    /** Manual reverse rollback of everything that ran (only meaningful
      * when execute() has not completed — `transaction_manager.py:168`).
      */
    def rollbackAll(): Unit = if (!completed) rollbackExecuted()

    private def rollbackExecuted(): Unit = {
      executed.reverseIterator.foreach { case (op, r) =>
        try op.undo(r)
        catch { case _: Throwable => () } // contained per op
      }
      executed.clear()
    }
  }

  /** Per-endpoint request timing store: bounded samples per endpoint
    * (`max_samples=1000`), bounded endpoint count (`max_endpoints=100`,
    * halving to the most recently active on overflow —
    * `metrics.py:27-54`), and slow-request detection at 1.0 s
    * (`metrics.py:83-84`).
    */
  final class Metrics(maxSamples: Int = 1000, maxEndpoints: Int = 100,
      slowThresholdSec: Double = 1.0) {
    private final class Ep {
      var count = 0L
      var lastSeen = 0L
      val samples = scala.collection.mutable.Queue.empty[Double]
    }
    private val eps = scala.collection.mutable.HashMap.empty[String, Ep]
    private var tick = 0L
    private var slowCount = 0L

    /** Record one request; returns true when it crossed the slow
      * threshold (the caller logs it — the reference's warning line).
      */
    def record(endpoint: String, sec: Double): Boolean = synchronized {
      tick += 1
      val ep = eps.getOrElseUpdate(endpoint, new Ep)
      ep.count += 1; ep.lastSeen = tick
      ep.samples.enqueue(sec)
      while (ep.samples.size > maxSamples) ep.samples.dequeue()
      if (eps.size > maxEndpoints) {
        // keep the most recently active half (metrics.py:44-54)
        val drop = eps.toSeq.sortBy(_._2.lastSeen).take(eps.size - maxEndpoints / 2)
        drop.foreach { case (k, _) => eps.remove(k) }
      }
      val slow = sec > slowThresholdSec
      if (slow) slowCount += 1
      slow
    }

    def slowRequests: Long = synchronized(slowCount)
    def endpoints: Int = synchronized(eps.size)

    /** count/avg/min/max/p95 over the retained window (rank-style p95:
      * value at ceil(0.95·n) of the ascending sort).
      */
    def summary(endpoint: String): Option[Map[String, Double]] = synchronized {
      eps.get(endpoint).filter(_.samples.nonEmpty).map { ep =>
        val s = ep.samples.toIndexedSeq.sorted
        Map(
          "count" -> ep.count.toDouble,
          "avg" -> s.sum / s.size,
          "min" -> s.head,
          "max" -> s.last,
          "p95" -> s(math.max(0, math.ceil(0.95 * s.size).toInt - 1)))
      }
    }
  }

  /** Component-status fold (`health_service.py:40-73`): any unhealthy ⇒
    * unhealthy, else any degraded ⇒ degraded, else healthy; plus uptime.
    * Checks are injected (storage reachability, config readability, …) and
    * a throwing check reports unhealthy rather than failing the endpoint.
    */
  final class HealthService(
      checks: Map[String, () => (String, String)],
      startedAtMs: Long = System.currentTimeMillis()) {

    def status(nowMs: Long = System.currentTimeMillis()): Map[String, String] = {
      val results = checks.map { case (name, chk) =>
        name -> (try chk() catch { case e: Throwable => ("unhealthy", e.toString) })
      }
      val states = results.values.map(_._1).toSeq
      val overall =
        if (states.contains("unhealthy")) "unhealthy"
        else if (states.contains("degraded")) "degraded"
        else "healthy"
      Map("status" -> overall,
        "uptime_seconds" -> ((nowMs - startedAtMs) / 1000L).toString) ++
        results.map { case (n, (s, d)) => s"component.$n" -> s"$s: $d" }
    }
  }
}
