package graft

import graft.api.TenantSecurity
import graft.api.TenantSecurity._
import graft.sources.VectorStoreCatalog

import java.nio.file.Files

/** Tenant trusted-host + CORS gate — case-for-case against the reference's
  * middleware tests (`/root/reference/tests/test_tenant_security.py:19-139`)
  * plus the engine-side additions: compiled-pattern cache invalidation on
  * config change and the authenticated/superadmin fallbacks.
  */
class TenantSecuritySpec extends SparkSpec {

  private def freshGate(trusted: Seq[String] = Seq("*.example.com"),
      cors: Seq[String] = Seq("https://app.example.com")): (VectorStoreCatalog, Gate) = {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_tsec").toString)
    cat.configSet("t1", "security.trusted_hosts", trusted.mkString(","))
    cat.configSet("t1", "security.cors_origins", cors.mkString(","))
    (cat, new Gate(cat))
  }

  test("match_pattern basic cases (test_match_pattern_basic)") {
    assert(matchPattern(Some("example.com"), Some("example.com")))
    assert(matchPattern(Some("anything"), Some("*")))
    assert(matchPattern(Some("api.example.com"), Some("*.example.com")))
    // leading '*.': the bare domain also matches
    assert(matchPattern(Some("example.com"), Some("*.example.com")))
    assert(!matchPattern(Some("badexample.com"), Some("*.example.com")))
    assert(matchPattern(Some("sub.example.org"),
      Some("re:^(?:.+\\.)?example\\.org$")))
    // general mid-string wildcard (the non-'*.'-special form)
    assert(matchPattern(Some("api.v2.com"), Some("api.*.com")))
    assert(!matchPattern(Some("apiXv2Xcom"), Some("api.*.com")),
      "dots must stay literal in wildcard patterns")
    // degenerate inputs
    assert(!matchPattern(None, Some("*")))
    assert(!matchPattern(Some("x"), None))
    assert(!matchPattern(Some("x"), Some("re:[invalid")),
      "invalid regex must match nothing, not throw")
  }

  test("is_allowed over a mixed list (test_is_allowed_list)") {
    val allowed = Seq("*.example.com", "api.svc.local", "re:^test-\\d+\\.local$")
    assert(isAllowed(Some("example.com"), allowed))
    assert(isAllowed(Some("api.example.com"), allowed))
    assert(isAllowed(Some("api.svc.local"), allowed))
    assert(isAllowed(Some("test-123.local"), allowed))
    assert(!isAllowed(Some("evil.com"), allowed))
    assert(!isAllowed(Some("anything"), Nil), "empty list allows nothing")
  }

  test("trusted host allows and blocks (test_trusted_host_middleware_allows_and_blocks)") {
    val (_, gate) = freshGate()
    assert(gate.checkHost("t1", "example.com") == HostAllowed)
    assert(gate.checkHost("t1", "api.example.com") == HostAllowed)
    assert(gate.checkHost("t1", "evil.com") == HostBlocked("Untrusted host"))
    // host:port strips to hostname (dispatch's split(":")[0])
    assert(gate.checkHost("t1", "api.example.com:8443") == HostAllowed)
    // case-insensitive (test_case_insensitive_host_matching)
    assert(gate.checkHost("t1", "API.EXAMPLE.COM") == HostAllowed)
    // deep subdomain (test_wildcard_to_root_and_subdomains)
    assert(gate.checkHost("t1", "deep.sub.api.example.com") == HostAllowed)
  }

  test("CORS allows and blocks origins; preflight returns the header block") {
    val (_, gate) = freshGate()
    // allowed origin: pass + echo (test_cors_middleware_allows_and_blocks_origins)
    gate.checkCors("t1", "GET", "example.com", Some("https://app.example.com")) match {
      case Pass(h) =>
        assert(h("Access-Control-Allow-Origin") == "https://app.example.com")
      case other => fail(s"expected Pass, got $other")
    }
    // blocked origin
    assert(gate.checkCors("t1", "GET", "example.com", Some("https://evil.com"))
      == CorsBlocked("CORS origin not allowed"))
    // preflight 204 analogue with the standard header block (test_cors_preflight_returns_204)
    gate.checkCors("t1", "OPTIONS", "example.com",
        Some("https://app.example.com")) match {
      case Preflight(h) =>
        assert(h("Access-Control-Allow-Origin") == "https://app.example.com")
        assert(h("Access-Control-Allow-Credentials") == "true")
        assert(h("Access-Control-Allow-Methods") == "*")
      case other => fail(s"expected Preflight, got $other")
    }
    // no Origin header: pass (restricted list only gates cross-origin requests)
    assert(gate.checkCors("t1", "GET", "example.com", None).isInstanceOf[Pass])
    // same-origin by hostname bypasses the origin list (dispatch's
    // _same_origin branch), localhost aliases equivalent
    gate.checkCors("t1", "GET", "app.internal", Some("https://app.internal:9000")) match {
      case Pass(h) =>
        assert(h("Access-Control-Allow-Origin") == "https://app.internal:9000")
      case other => fail(s"expected same-origin Pass, got $other")
    }
    assert(gate.checkCors("t1", "GET", "localhost:3000",
      Some("http://127.0.0.1:8080")).isInstanceOf[Pass])
  }

  test("wildcard global fallback when the tenant has no config entry") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_tsec_fb").toString)
    val gate = new Gate(cat,
      globalTrustedHosts = Seq("global.host"), globalCorsOrigins = Seq("*"))
    assert(gate.checkHost("t2", "global.host") == HostAllowed)
    assert(gate.checkHost("t2", "other.host") == HostBlocked("Untrusted host"))
    // '*' origins: everything passes, echo is '*'
    gate.checkCors("t2", "GET", "global.host", Some("https://anywhere.io")) match {
      case Pass(h) => assert(h("Access-Control-Allow-Origin") == "*")
      case other   => fail(s"expected Pass, got $other")
    }
  }

  test("authenticated trusted-host CORS fallback and superadmin bypass") {
    val (cat, gate) = freshGate()
    val (uid, secret) = cat.createUser("t1")
    // blocked origin + trusted host + AUTHENTICATED client → allowed with
    // the Origin echoed (tenant_security.py:316-351)
    gate.checkCors("t1", "GET", "api.example.com", Some("https://evil.com"),
        Some(Credentials(uid, secret))) match {
      case Pass(h) => assert(h("Access-Control-Allow-Origin") == "https://evil.com")
      case other   => fail(s"expected authenticated fallback Pass, got $other")
    }
    // wrong secret: still blocked
    assert(gate.checkCors("t1", "GET", "api.example.com", Some("https://evil.com"),
      Some(Credentials(uid, "nope"))) == CorsBlocked("CORS origin not allowed"))
    // untrusted host + blocked origin: plain auth is NOT enough...
    assert(gate.checkCors("t1", "GET", "evil.host", Some("https://evil.com"),
      Some(Credentials(uid, secret))) == CorsBlocked("CORS origin not allowed"))
    // ...but a superadmin grant bypasses both CORS and trusted-host
    cat.configSet("t1", s"role.$uid",
      (cat.grants("t1", uid) :+ "superadmin").mkString(","))
    assert(gate.checkCors("t1", "GET", "evil.host", Some("https://evil.com"),
      Some(Credentials(uid, secret))).isInstanceOf[Pass])
    assert(gate.checkHost("t1", "evil.host",
      Some(Credentials(uid, secret))) == HostAllowed)
    // without credentials the host stays blocked
    assert(gate.checkHost("t1", "evil.host") == HostBlocked("Untrusted host"))
  }

  test("pattern compilation is cached and invalidated by config change") {
    val (cat, gate) = freshGate(trusted = Seq("*.example.com"))
    assert(gate.checkHost("t1", "api.example.com") == HostAllowed)
    val entriesAfterFirst = gate.compiledEntries
    // repeated checks against an unchanged config re-use the compilation
    (1 to 5).foreach(_ => gate.checkHost("t1", "api.example.com"))
    assert(gate.compiledEntries == entriesAfterFirst,
      "unchanged config must not grow the compiled cache")
    // config change: the new list takes effect immediately (raw-string
    // cache key — no stale compiled patterns)
    cat.configSet("t1", "security.trusted_hosts", "*.other.org")
    assert(gate.checkHost("t1", "api.example.com") == HostBlocked("Untrusted host"))
    assert(gate.checkHost("t1", "deep.other.org") == HostAllowed)
    assert(gate.compiledEntries == entriesAfterFirst + 1,
      "changed config must compile exactly one new list")
  }
}

/** OWASP header decoration + docs-HTML sanitizer parity
  * (`security_headers.py:44-176`, `docs_sanitizer.py:14-76`).
  */
class SecurityDecorationsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.api.SecurityDecorations._

  test("production headers: 5 base + HSTS + CSP; HSTS drops when disabled or non-prod") {
    val prod = headersToAdd(isProduction = true).toMap
    assert(prod("X-Content-Type-Options") == "nosniff")
    assert(prod("X-Frame-Options") == "DENY")
    assert(prod("X-XSS-Protection") == "1; mode=block")
    assert(prod("Referrer-Policy") == "strict-origin-when-cross-origin")
    assert(prod("Permissions-Policy").startsWith("accelerometer=(), autoplay=()"))
    assert(prod("Strict-Transport-Security") ==
      "max-age=31536000; includeSubDomains; preload")
    assert(prod.contains("Content-Security-Policy"))
    assert(prod.size == 7)
    assert(!headersToAdd(isProduction = false).toMap
      .contains("Strict-Transport-Security"), "no HSTS outside production")
    assert(!headersToAdd(isProduction = true, CspConfig(enableHsts = false))
      .toMap.contains("Strict-Transport-Security"), "no HSTS when disabled")
  }

  test("CSP: defaults, keyword re-quoting, quote stripping, dev websocket allowance") {
    val dflt = buildCsp(CspConfig(), isProduction = true)
    assert(dflt.startsWith("default-src 'self'; script-src 'self'; " +
      "style-src 'self' 'unsafe-inline'; img-src 'self' data: https:; "))
    assert(dflt.endsWith("frame-ancestors 'none'; base-uri 'self'; form-action 'self'"))
    assert(dflt.contains("worker-src 'self' blob:; "))
    // bare keywords get quoted; double-quoted tokens get stripped then requoted
    val custom = buildCsp(CspConfig(
      scriptSrc = Some(Seq("self", "\"unsafe-eval\"", "https://cdn.example"))),
      isProduction = true)
    assert(custom.contains("script-src 'self' 'unsafe-eval' https://cdn.example; "))
    // development adds localhost:* and ws: to connect-src only
    val dev = buildCsp(CspConfig(), isProduction = false)
    assert(dev.contains("connect-src 'self' localhost:* ws:; "))
    assert(buildCsp(CspConfig(), isProduction = true)
      .contains("connect-src 'self'; "))
  }

  test("decorate overwrites existing header values like the reference's assignment loop") {
    val out = decorate(Map("X-Frame-Options" -> "SAMEORIGIN", "X-Other" -> "kept"),
      isProduction = true)
    assert(out("X-Frame-Options") == "DENY")
    assert(out("X-Other") == "kept")
  }

  test("docs sanitizer: strips the CF beacon only for docs-path HTML, None otherwise") {
    val beacon = "<script defer src='https://static.cloudflareinsights.com/beacon.min.js' " +
      "data-cf-beacon='{}'>\n</script>"
    val html = s"<html><head>$beacon</head><body>ok</body></html>"
    assert(sanitizeDocsHtml("/docs", "text/html; charset=utf-8", html) ==
      Some("<html><head></head><body>ok</body></html>"))
    // non-docs path, non-HTML content, and beacon-free bodies pass through as None
    assert(sanitizeDocsHtml("/api/v1/search", "text/html", html).isEmpty)
    assert(sanitizeDocsHtml("/docs", "application/json", html).isEmpty)
    assert(sanitizeDocsHtml("/docs", "text/html", "<html>clean</html>").isEmpty)
    // the regex is case-insensitive and dot-matches-newline like the reference's
    val upper = "<SCRIPT src='x STATIC.CLOUDFLAREINSIGHTS.COM y'>a\nb</SCRIPT>done"
    assert(sanitizeDocsHtml("/redoc", "TEXT/HTML", upper) == Some("done"))
  }
}
