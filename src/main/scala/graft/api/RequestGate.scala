package graft.api

/** Back-pressure answer from the catalog's backlog pressure gate when the
  * collection runs `backlog_pressure_mode = reject`: a pending index
  * rebuild's backlog hit the absorb threshold, and the collection prefers
  * the caller retry (the 429/retry_after shape, like [[RequestGate]]'s
  * denials) over a silent multi-minute await inside insert. The live
  * index is exact throughout — retry after [[retryAfterSec]] (a heuristic
  * floor: rebuilds are multi-second Spark job chains, never instant).
  */
final class BacklogPressureException(
    val tenant: String, val model: String, val family: String,
    val retryAfterSec: Int = 5)
  extends RuntimeException(
    s"index rebuild backlog at threshold for $tenant/$model ($family): " +
    s"insert deferred, retry in ~${retryAfterSec}s or await the rebuild")

/** Service-shell parity: request rate limiting + failed-auth offender
  * lockout — the two reference middlewares every request passes through
  * (`/root/reference/app/middleware/rate_limit.py:23-88`,
  * `app/middleware/tenant_rate_limit.py:17-84`,
  * `app/dependencies/auth.py:105-274` +
  * `app/modules/offender_manager.py:23-135`).
  *
  * Engine-side this is deliberately a thin, driver-local module (the
  * reference's is process-local too and says "use a shared store for
  * multi-process"): pure in-memory sliding windows behind one lock, no
  * Spark, no storage. The clock is injectable so specs drive the windows
  * deterministically; production uses the monotonic clock (immune to wall
  * clock adjustments — same choice as `tenant_rate_limit.py:50`).
  */
object RequestGate {

  /** Decision for one request: allowed + the reference's info fields
    * (limit/current/remaining, retry_after seconds when denied —
    * `tenant_rate_limit.py:61-75`).
    */
  final case class Decision(
      allowed: Boolean,
      limit: Int,
      current: Int,
      remaining: Int,
      retryAfterSec: Int)

  /** Sliding-window rate limiter: at most `calls` requests per `periodSec`
    * seconds per key. Exactly the reference's algorithm: drop timestamps
    * older than the window, deny at `current >= calls` computing
    * retry_after from the OLDEST surviving timestamp, else record.
    * IP limiter default 100/60s (`app/main.py:243`); tenant limiter
    * 200/60s default tier, 1000/60s premium
    * (`tenant_rate_limit.py:32-35`).
    */
  final class SlidingWindowLimiter(
      calls: Int,
      periodSec: Long,
      clock: () => Long = () => System.nanoTime() / 1000000L) {
    require(calls > 0 && periodSec > 0, "calls and period must be positive")
    private val windows =
      scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.Queue[Long]]

    def check(key: String): Decision = synchronized {
      val now = clock()
      val q = windows.getOrElseUpdate(key, scala.collection.mutable.Queue.empty)
      while (q.nonEmpty && now - q.head >= periodSec * 1000L) q.dequeue()
      val current = q.size
      if (current >= calls) {
        val retry = ((periodSec * 1000L - (now - q.head)) / 1000L).toInt + 1
        Decision(allowed = false, calls, current, 0, retry)
      } else {
        q.enqueue(now)
        // info fields reflect state BEFORE this request is recorded —
        // reference-exact (tenant_rate_limit.py:61-67 computes `info` from
        // the pruned list before appending): first allowed call reports
        // current=0, remaining=calls
        Decision(allowed = true, calls, current, math.max(0, calls - current), 0)
      }
    }

    /** Reference's periodic cleanup (`tenant_rate_limit.py:85-102`,
      * `app/tasks/cleanup.py:16-49` runs it every 60 s): drop keys whose
      * whole window expired, so dead tenants/IPs don't accumulate.
      * Returns removed-key count.
      */
    def cleanup(): Int = synchronized {
      val now = clock()
      val dead = windows.collect {
        case (k, q) if q.isEmpty || now - q.last >= periodSec * 1000L => k
      }.toSeq
      dead.foreach(windows.remove)
      dead.size
    }

    def trackedKeys: Int = synchronized(windows.size)
  }

  /** Failed-auth offender tracker (`offender_manager.py:97-135`): per
    * client key, count failures inside a rolling window anchored at the
    * FIRST failure; past `maxAttempts` failures in the window the key is
    * blocked for `blockSec`. A failure outside the window resets the
    * anchor (the reference's reset-then-count behavior, including its
    * quirk that the resetting attempt counts as 1 — but NOT its hole of
    * clearing a still-active block on reset; see registerFailure).
    */
  final class OffenderTracker(
      maxAttempts: Int = 5,      // config default block_max_attempts=5
      windowSec: Long = 60,      // block_window_seconds=60
      blockSec: Long = 200,      // block_seconds=200
      clock: () => Long = () => System.nanoTime() / 1000000L) {
    private final case class Rec(var count: Int, var firstSeen: Long,
        var blockedUntil: Long)
    private val store = scala.collection.mutable.HashMap.empty[String, Rec]

    /** (blocked, msRemaining) — the auth middleware's pre-check
      * (`auth.py:137-147`: blocked IPs get 429 before any auth work).
      */
    def isBlocked(key: String): (Boolean, Long) = synchronized {
      val now = clock()
      store.get(key) match {
        case Some(r) if r.blockedUntil > now => (true, r.blockedUntil - now)
        case _ => (false, 0L)
      }
    }

    /** Register one failed attempt; returns true when THIS attempt tripped
      * the block (`offender_manager.py:105-134`).
      */
    def registerFailure(key: String): Boolean = synchronized {
      val now = clock()
      store.get(key) match {
        case None =>
          store(key) = Rec(1, now, 0L); false
        case Some(r) if now - r.firstSeen > windowSec * 1000L =>
          // window reset PRESERVES a still-active block (documented
          // deviation: the reference zeroes blocked_until here,
          // offender_manager.py:117-121, which lets a blocked client
          // self-unblock by failing again once the 60 s window passes —
          // blockSec=200 > windowSec=60 makes that a real hole for any
          // caller that skips the isBlocked pre-check)
          r.count = 1; r.firstSeen = now
          if (r.blockedUntil <= now) r.blockedUntil = 0L
          false
        case Some(r) =>
          r.count += 1
          if (r.count > maxAttempts) { r.blockedUntil = now + blockSec * 1000L; true }
          else false
      }
    }

    /** Successful auth clears the record (a legitimate client that fat-
      * fingered a secret shouldn't stay one slip from lockout).
      */
    def clear(key: String): Unit = synchronized { store.remove(key) }

    /** Drop records that can no longer influence any decision: failure
      * window passed AND block expired. Without this, one failed attempt
      * per scanning IP accumulates a record forever — the exact dead-key
      * growth the cleanup loop exists to prevent (the reference tracker
      * has the same leak; the loop here sweeps it too).
      */
    def cleanup(): Int = synchronized {
      val now = clock()
      val dead = store.collect {
        case (k, r) if now - r.firstSeen > windowSec * 1000L &&
          r.blockedUntil <= now => k
      }.toSeq
      dead.foreach(store.remove)
      dead.size
    }

    def trackedKeys: Int = synchronized(store.size)
  }

  /** The assembled per-request gate in middleware order (`app/main.py:
    * 236-246`: auth/offender before the IP rate limit, tenant limit at the
    * router): blocked-offender 429 → IP window → tenant window. Auth
    * OUTCOMES feed [[OffenderTracker]] via the caller (it owns the
    * credential check — [[graft.sources.VectorStoreCatalog.authenticate]]).
    */
  final class Gate(
      val ip: SlidingWindowLimiter,
      val tenant: SlidingWindowLimiter,
      val offenders: OffenderTracker) {

    sealed trait Verdict
    case object Allowed extends Verdict
    final case class Blocked(msRemaining: Long) extends Verdict
    final case class RateLimited(scope: String, d: Decision) extends Verdict

    def admit(clientIp: String, tenantCode: String): Verdict = {
      val (blocked, rem) = offenders.isBlocked(clientIp)
      if (blocked) return Blocked(rem)
      val ipD = ip.check(clientIp)
      if (!ipD.allowed) return RateLimited("ip", ipD)
      val tD = tenant.check(tenantCode)
      if (!tD.allowed) RateLimited("tenant", tD) else Allowed
    }
  }

  /** Reference-default gate: IP 100/60s, tenant 200/60s, offender 5-in-60s
    * → 200s block.
    */
  def default(clock: () => Long = () => System.nanoTime() / 1000000L): Gate =
    new Gate(
      new SlidingWindowLimiter(100, 60, clock),
      new SlidingWindowLimiter(200, 60, clock),
      new OffenderTracker(clock = clock))

  /** Background cleanup loop (`app/tasks/cleanup.py:16-49` runs every
    * 60 s): periodically drop fully-expired limiter keys so dead
    * tenants/IPs never accumulate in a long-lived driver. Daemon thread;
    * `close()` stops it promptly. Exceptions are contained per tick (the
    * reference loop likewise survives a failed cleanup pass).
    */
  def startCleanupLoop(gate: Gate, intervalMs: Long = 60000L): AutoCloseable = {
    require(intervalMs > 0, "intervalMs must be positive")
    val stop = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      while (!stop.await(intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try { gate.ip.cleanup(); gate.tenant.cleanup(); gate.offenders.cleanup() }
        catch { case _: Throwable => () }
      }
    }, "graft-gate-cleanup")
    t.setDaemon(true)
    t.start()
    () => { stop.countDown(); t.join(1000) }
  }
}
