package graft

import graft.api.RequestGate
import org.scalatest.funsuite.AnyFunSuite

/** Service-shell parity gate (r9 verdict item 7): sliding-window rate
  * limits + failed-auth offender lockout, against the reference's numbers
  * (`rate_limit.py` 100/60s IP, `tenant_rate_limit.py` 200/60s tenant,
  * `offender_manager.py` 5-in-60s → 200s block). Deterministic fake clock.
  */
class RequestGateSpec extends AnyFunSuite {

  private final class FakeClock(var ms: Long = 0L) {
    def fn: () => Long = () => ms
    def advanceSec(s: Long): Unit = ms += s * 1000L
  }

  test("sliding window: allows `calls`, denies the next with retry_after, refills as the window slides") {
    val clk = new FakeClock
    val lim = new RequestGate.SlidingWindowLimiter(3, 60, clk.fn)
    assert((1 to 3).forall(_ => lim.check("ip1").allowed))
    val denied = lim.check("ip1")
    assert(!denied.allowed && denied.current == 3 && denied.remaining == 0)
    // oldest request is at t=0: retry_after = ceil-ish of remaining window
    assert(denied.retryAfterSec == 61)
    // keys are independent
    assert(lim.check("ip2").allowed)
    // 61s later the whole window slid: full budget again. Info fields are
    // PRE-RECORD, reference-exact (tenant_rate_limit.py:61-67): the
    // admitted request itself is not in current/remaining yet
    clk.advanceSec(61)
    val d = lim.check("ip1")
    assert(d.allowed && d.current == 0 && d.remaining == 3)
  }

  test("sliding window refills INCREMENTALLY (per-request expiry, not a fixed bucket reset)") {
    val clk = new FakeClock
    val lim = new RequestGate.SlidingWindowLimiter(2, 60, clk.fn)
    assert(lim.check("k").allowed)      // t=0
    clk.advanceSec(30)
    assert(lim.check("k").allowed)      // t=30
    assert(!lim.check("k").allowed)     // full
    clk.advanceSec(31)                  // t=61: the t=0 entry expired, t=30 lives
    val d = lim.check("k")
    assert(d.allowed && d.current == 1, "only the expired entry refills (pre-record count)")
    assert(!lim.check("k").allowed)
  }

  test("cleanup drops only fully-expired keys") {
    val clk = new FakeClock
    val lim = new RequestGate.SlidingWindowLimiter(5, 60, clk.fn)
    lim.check("dead"); clk.advanceSec(30); lim.check("live")
    clk.advanceSec(35) // dead's last entry 65s old, live's 35s old
    assert(lim.cleanup() == 1)
    assert(lim.trackedKeys == 1)
  }

  test("offender lockout: 6th failure in the window blocks for block_seconds; expiry unblocks") {
    val clk = new FakeClock
    val t = new RequestGate.OffenderTracker(maxAttempts = 5, windowSec = 60,
      blockSec = 200, clock = clk.fn)
    assert((1 to 5).forall(_ => !t.registerFailure("ip")))
    assert(!t.isBlocked("ip")._1, "at the threshold, not yet over it")
    assert(t.registerFailure("ip"), "6th failure must trip the block")
    val (blocked, rem) = t.isBlocked("ip")
    assert(blocked && rem == 200000L)
    clk.advanceSec(199)
    assert(t.isBlocked("ip")._1)
    clk.advanceSec(2)
    assert(!t.isBlocked("ip")._1, "block expires after block_seconds")
  }

  test("offender window reset: a failure outside the window restarts the count at 1") {
    val clk = new FakeClock
    val t = new RequestGate.OffenderTracker(maxAttempts = 5, windowSec = 60,
      blockSec = 200, clock = clk.fn)
    (1 to 5).foreach(_ => t.registerFailure("ip"))
    clk.advanceSec(61) // window anchored at first failure has passed
    assert(!t.registerFailure("ip"), "reset attempt counts as 1, no block")
    assert((1 to 4).forall(_ => !t.registerFailure("ip")))
    assert(t.registerFailure("ip"), "6th inside the NEW window blocks")
  }

  test("an active block survives a window reset (no self-unblock by failing again)") {
    val clk = new FakeClock
    val t = new RequestGate.OffenderTracker(maxAttempts = 5, windowSec = 60,
      blockSec = 200, clock = clk.fn)
    (1 to 6).foreach(_ => t.registerFailure("ip"))
    assert(t.isBlocked("ip")._1)
    // 61 s later the FAILURE window has passed but the 200 s block has not;
    // the reference zeroes blocked_until here (offender_manager.py:117-121)
    // — a library caller without the isBlocked pre-check would be open
    // again. The tracker preserves the block instead (documented deviation).
    clk.advanceSec(61)
    assert(!t.registerFailure("ip"), "reset attempt restarts the count")
    assert(t.isBlocked("ip")._1, "failing again must not clear an active block")
    clk.advanceSec(140) // t=201: block expired on its own schedule
    assert(!t.isBlocked("ip")._1)
  }

  test("successful auth clears the offender record") {
    val clk = new FakeClock
    val t = new RequestGate.OffenderTracker(clock = clk.fn)
    (1 to 5).foreach(_ => t.registerFailure("ip"))
    t.clear("ip")
    assert((1 to 5).forall(_ => !t.registerFailure("ip")), "count restarted")
  }

  test("assembled gate: blocked offender beats rate limits; ip limit beats tenant limit") {
    val clk = new FakeClock
    val gate = new RequestGate.Gate(
      new RequestGate.SlidingWindowLimiter(2, 60, clk.fn),
      // tenant window = 2 as well: the two allowed requests below fill it,
      // so a THIRD ip's request hits the tenant limit (the ip-denied third
      // request never reaches the tenant window)
      new RequestGate.SlidingWindowLimiter(2, 60, clk.fn),
      new RequestGate.OffenderTracker(maxAttempts = 1, windowSec = 60,
        blockSec = 200, clock = clk.fn))
    assert(gate.admit("1.2.3.4", "acme") == gate.Allowed)
    assert(gate.admit("1.2.3.4", "acme") == gate.Allowed)
    gate.admit("1.2.3.4", "acme") match {
      case gate.RateLimited("ip", d) => assert(d.remaining == 0)
      case v => fail(s"expected ip rate limit, got $v")
    }
    // different IP, same tenant: tenant window (3/60) is the binding one
    gate.admit("5.6.7.8", "acme") match {
      case gate.RateLimited("tenant", _) => ()
      case v => fail(s"expected tenant rate limit, got $v")
    }
    // trip the offender: 2 failures with maxAttempts=1
    gate.offenders.registerFailure("9.9.9.9")
    gate.offenders.registerFailure("9.9.9.9")
    gate.admit("9.9.9.9", "acme") match {
      case gate.Blocked(rem) => assert(rem > 0)
      case v => fail(s"expected offender block, got $v")
    }
  }

  test("offender cleanup drops only spent records (window passed, block expired)") {
    val clk = new FakeClock
    val t = new RequestGate.OffenderTracker(maxAttempts = 5, windowSec = 60,
      blockSec = 200, clock = clk.fn)
    t.registerFailure("scanner1")           // one-and-done scanner
    clk.advanceSec(30)
    t.registerFailure("active")             // inside its window
    (1 to 6).foreach(_ => t.registerFailure("blocked")) // blocked for 200s
    clk.advanceSec(35) // scanner1's window passed; active's has not
    assert(t.trackedKeys == 3)
    assert(t.cleanup() == 1, "only the spent scanner record drops")
    assert(t.trackedKeys == 2)
    assert(t.isBlocked("blocked")._1, "blocked record must survive cleanup")
    clk.advanceSec(200) // block expired AND window long past
    assert(t.cleanup() == 2)
    assert(t.trackedKeys == 0)
  }

  test("cleanup loop: expired keys drop on the next tick; close() stops the thread") {
    val clk = new FakeClock
    val gate = new RequestGate.Gate(
      new RequestGate.SlidingWindowLimiter(5, 60, clk.fn),
      new RequestGate.SlidingWindowLimiter(5, 60, clk.fn),
      new RequestGate.OffenderTracker(clock = clk.fn))
    gate.admit("1.1.1.1", "t1"); gate.admit("2.2.2.2", "t2")
    assert(gate.ip.trackedKeys == 2 && gate.tenant.trackedKeys == 2)
    val loop = RequestGate.startCleanupLoop(gate, intervalMs = 25L)
    try {
      clk.advanceSec(61) // every window now expired
      val deadline = System.nanoTime() + 5000000000L
      while ((gate.ip.trackedKeys > 0 || gate.tenant.trackedKeys > 0) &&
             System.nanoTime() < deadline) Thread.sleep(10)
      assert(gate.ip.trackedKeys == 0 && gate.tenant.trackedKeys == 0,
        "cleanup loop did not drop expired keys within 5s")
    } finally loop.close()
  }

  test("end-to-end with catalog auth: repeated bad secrets lock the client out; good auth clears") {
    val clk = new FakeClock
    val gate = RequestGate.default(clk.fn)
    // the caller owns the credential check; wire the standard loop
    def tryAuth(ok: Boolean, ip: String): Either[String, Unit] = {
      val (blocked, _) = gate.offenders.isBlocked(ip)
      if (blocked) Left("blocked")
      else if (ok) { gate.offenders.clear(ip); Right(()) }
      else {
        val tripped = gate.offenders.registerFailure(ip)
        Left(if (tripped) "blocked" else "unauthorized")
      }
    }
    assert((1 to 5).forall(_ => tryAuth(ok = false, "ip") == Left("unauthorized")))
    assert(tryAuth(ok = false, "ip") == Left("blocked"))
    assert(tryAuth(ok = true, "ip") == Left("blocked"),
      "even a correct secret is rejected while blocked (reference 429-first)")
    clk.advanceSec(201)
    assert(tryAuth(ok = true, "ip") == Right(()))
    assert(tryAuth(ok = false, "ip") == Left("unauthorized"), "record cleared by success")
  }
}
