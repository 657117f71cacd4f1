package graft

import graft.api.{SchemaSpec, ServiceShell}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Service-shell parity (r9 verdict "missing" items 3-5): transaction
  * rollback, metrics store + slow-request detection, health aggregation —
  * against the reference semantics in `transaction_manager.py`,
  * `middleware/metrics.py`, `services/health_service.py`.
  */
class ServiceShellSpec extends AnyFunSuite {

  test("transaction: all ops run in order; results returned") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new ServiceShell.Transaction("ok")
    t.add(() => { log += "a"; 1 }).add(() => { log += "b"; 2 })
    assert(t.execute() == Seq(1, 2))
    assert(log.toSeq == Seq("a", "b"))
  }

  test("transaction: failure rolls back executed ops in REVERSE order, then rethrows") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new ServiceShell.Transaction("boom")
    t.add(() => { log += "a"; "ra" }, r => log += s"undo-$r")
    t.add(() => { log += "b"; "rb" }, r => log += s"undo-$r")
    t.add(() => throw new RuntimeException("step3"), _ => log += "undo-never")
    val e = intercept[RuntimeException](t.execute())
    assert(e.getMessage == "step3")
    // reverse order, failed op NOT rolled back (it never executed)
    assert(log.toSeq == Seq("a", "b", "undo-rb", "undo-ra"))
  }

  test("transaction: a throwing undo is contained — remaining undos still run") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new ServiceShell.Transaction("badundo")
    t.add(() => "ra", _ => log += "undo-a")
    t.add(() => "rb", _ => throw new RuntimeException("broken undo"))
    t.add(() => throw new RuntimeException("fail"))
    intercept[RuntimeException](t.execute())
    assert(log.toSeq == Seq("undo-a"), "undo-a must run despite undo-b throwing")
  }

  test("transaction: manual rollbackAll is a no-op after completion") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new ServiceShell.Transaction("done")
    t.add(() => "r", _ => log += "undo")
    t.execute()
    t.rollbackAll()
    assert(log.isEmpty, "completed transactions must not roll back")
  }

  test("metrics: sample window bounded, slow requests detected at >1s, summary stats") {
    val m = new ServiceShell.Metrics(maxSamples = 4, maxEndpoints = 100)
    assert(!m.record("/search", 0.2))
    assert(m.record("/search", 1.5), "1.5s must flag slow")
    (1 to 5).foreach(i => m.record("/search", i * 0.1))
    assert(m.slowRequests == 1)
    val s = m.summary("/search").get
    // only the last 4 samples retained: 0.2, 0.3, 0.4, 0.5
    assert(s("count") == 7.0)
    assert(math.abs(s("min") - 0.2) < 1e-9 && math.abs(s("max") - 0.5) < 1e-9)
    assert(math.abs(s("avg") - 0.35) < 1e-9)
    assert(math.abs(s("p95") - 0.5) < 1e-9)
    assert(m.summary("/nope").isEmpty)
  }

  test("metrics: endpoint overflow evicts the least recently active half") {
    val m = new ServiceShell.Metrics(maxEndpoints = 4)
    (1 to 5).foreach(i => m.record(s"/e$i", 0.1))
    assert(m.endpoints == 2, "overflow keeps the most recent maxEndpoints/2")
    assert(m.summary("/e5").isDefined && m.summary("/e1").isEmpty)
  }

  test("health: unhealthy dominates degraded dominates healthy; throwing check is unhealthy") {
    def svc(checks: Map[String, () => (String, String)]) =
      new ServiceShell.HealthService(checks, startedAtMs = 0L)
    val ok = () => ("healthy", "ok")
    assert(svc(Map("a" -> ok))
      .status(nowMs = 5000L)("status") == "healthy")
    assert(svc(Map("a" -> ok, "b" -> (() => ("degraded", "slow"))))
      .status()("status") == "degraded")
    assert(svc(Map("a" -> (() => ("degraded", "x")),
        "b" -> (() => ("unhealthy", "down"))))
      .status()("status") == "unhealthy")
    val boom = svc(Map("a" -> (() => throw new RuntimeException("dead"))))
    val st = boom.status()
    assert(st("status") == "unhealthy" && st("component.a").startsWith("unhealthy"))
    assert(svc(Map("a" -> ok)).status(nowMs = 5000L)("uptime_seconds") == "5")
  }
}

/** Admin key-fingerprint endpoint parity (`admin.py:23-67`): masking,
  * SHA-256 fingerprint format, admin gating, log sanitization.
  */
class AdminServiceSpec extends AnyFunSuite {
  import ServiceShell.AdminService

  test("masked: first4...last4; ≤8 chars returns whole; empty stays empty") {
    assert(AdminService.masked("abcdefghij") == "abcd...ghij")
    assert(AdminService.masked("abcdefgh") == "abcdefgh") // len == 2n: whole
    assert(AdminService.masked("abc") == "abc")
    assert(AdminService.masked("") == "")
  }

  test("fingerprint is lowercase sha256 hex of the raw secret") {
    // known vector: sha256("abc")
    assert(AdminService.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("sanitizeForLog: control chars → _, 200-char cap with ... tail") {
    assert(AdminService.sanitizeForLog("a\r\nb\tc") == "a__b_c")
    assert(AdminService.sanitizeForLog("x\u0001y\u007fz") == "x_y_z")
    val long = AdminService.sanitizeForLog("q" * 300)
    assert(long.length == 200 && long.endsWith("..."))
    assert(AdminService.sanitizeForLog(null) == "None")
  }

  test("fingerprints: 403 detail for non-admin; rows for admin and superadmin") {
    val clients = Map("cid_a" -> "secret-aaaa-zzzz", "cid_b" -> "s")
    assert(ServiceShell.AdminService.fingerprints(clients, "user") ==
      Left("Admin access required"))
    for (ct <- Seq("admin", "superadmin")) {
      val rows = AdminService.fingerprints(clients, ct).toOption.get
      assert(rows.map(_("client_id")) == Seq("cid_a", "cid_b"))
      val a = rows.head
      assert(a("fingerprint") == AdminService.sha256Hex("secret-aaaa-zzzz"))
      assert(a("masked") == "secr...zzzz")
      assert(!a.values.exists(_ == "secret-aaaa-zzzz"), "raw secret must not appear")
    }
  }
}

/** Transactional tenant setup through the real catalog (needs Spark for
  * the catalog constructor only).
  */
class TenantSetupSpec extends SparkSpec {
  import graft.sources.VectorStoreCatalog

  test("setupTenant: collection + user created; a failing extra step undoes BOTH") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_txn").toString)
    val spec = SchemaSpec("t", "m", dimension = 4, nlist = 2)
    // clean path: both steps land and credentials authenticate
    val (cid, secret) = cat.setupTenant(spec)
    assert(cat.collectionExists("t", "m"))
    assert(cat.authenticate("t", cid, secret))

    // failing path on a fresh tenant: everything rolls back
    val spec2 = SchemaSpec("t2", "m2", dimension = 4, nlist = 2)
    intercept[RuntimeException] {
      cat.setupTenant(spec2, extraSteps = Seq(
        (() => throw new RuntimeException("grant step failed"), _ => ())))
    }
    assert(!cat.collectionExists("t2", "m2"),
      "rolled-back setup must drop the collection")
    assert(!cat.authenticate("t2", "anything", "x"),
      "rolled-back setup must leave no authenticatable user")
  }
}
