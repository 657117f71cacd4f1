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

  /** Admin key-fingerprint listing (`app/routers/admin.py:36-67`): SHA-256
    * fingerprints + masked ids of stored client secrets — never the raw
    * secret. Gated to admin/superadmin callers like the reference's
    * client_type check; client ids pass through the log sanitizer
    * (`app/utils/log_sanitizer.py:60-82`: control chars → `_`, 200-char
    * cap). The client store here is the tenant user table (the engine has
    * no separate key_manager config file).
    */
  object AdminService {

    def sha256Hex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    /** first-n "..." last-n; a string of ≤ 2n chars returns whole
      * (`admin.py:28-33` — at that length the mask would reveal it anyway).
      */
    def masked(s: String, n: Int = 4): String =
      if (s == null || s.isEmpty) ""
      else if (s.length <= n * 2) s
      else s.take(n) + "..." + s.takeRight(n)

    /** `sanitize_for_log`: CR/LF/tab/control chars (C0 + DEL + C1) → `_`,
      * hard 200-char cap with a `...` tail.
      */
    def sanitizeForLog(value: String): String = {
      if (value == null) return "None"
      val cleaned = value.map(c =>
        if (c < ' ' || (c >= '\u007f' && c <= '\u009f')) '_' else c)
      if (cleaned.length > 200) cleaned.take(197) + "..." else cleaned
    }

    /** GET /admin/fingerprints: Left(403 detail) for non-admin callers,
      * else one row per stored client — (client_id, fingerprint, masked).
      * A client whose secret cannot be fingerprinted is skipped, not
      * fatal (`admin.py:63-64`).
      */
    def fingerprints(clients: Map[String, String],
        clientType: String): Either[String, Seq[Map[String, String]]] =
      if (clientType != "admin" && clientType != "superadmin")
        Left("Admin access required")
      else Right(clients.toSeq.sortBy(_._1).flatMap { case (cid, secret) =>
        try Some(Map(
          "client_id" -> sanitizeForLog(cid),
          "fingerprint" -> sha256Hex(secret),
          "masked" -> masked(secret)))
        catch { case _: Throwable => None }
      })
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
