package graft.api

import graft.sources.VectorStoreCatalog

import java.util.concurrent.ConcurrentHashMap
import scala.util.matching.Regex

/** Per-tenant trusted-host + CORS gating — the engine-side re-expression of
  * the reference's tenant security middleware
  * (`/root/reference/app/middleware/tenant_security.py:23-145` pattern
  * matcher, `:191-246` trusted-host dispatch, `:248-419` CORS dispatch).
  * The HTTP frame (Starlette middleware, Response objects) stays out of
  * engine scope; what lives here is every decision the middleware makes:
  * pattern semantics, per-tenant config with global fallback, same-origin
  * and localhost equivalence, the trusted-host-authenticated CORS fallback,
  * the superadmin bypass, and the echoed Allow-Origin value.
  *
  * Pattern lists come from the tenant config KV (D8) under
  * `security.trusted_hosts` / `security.cors_origins` (comma-separated),
  * the analogue of config_service.get_trusted_hosts/get_cors_origins
  * (`app/services/config_service.py:253-273`). Compilation is cached keyed
  * by the RAW list string, so a config change (a different string) misses
  * the cache and recompiles — invalidation is automatic and race-free
  * without hooking the KV write path.
  */
object TenantSecurity {

  /** One pattern's compiled form. `re:`-prefixed entries and wildcard
    * entries compile to a full-match regex ONCE; exact entries and `*`
    * stay string compares. Invalid regexes match nothing (the reference
    * logs and returns False — tenant_security.py:86-91).
    */
  private[api] sealed trait Compiled {
    def matches(value: String): Boolean
  }
  private case object MatchAll extends Compiled {
    def matches(value: String) = true
  }
  private final case class Exact(p: String) extends Compiled {
    def matches(value: String) = value == p
  }
  private final case class Rx(r: Regex) extends Compiled {
    def matches(value: String) = r.pattern.matcher(value).matches()
  }
  private case object MatchNone extends Compiled {
    def matches(value: String) = false
  }

  /** Compile one pattern (tenant_security.py:51-112 match_pattern):
    *  - `*` matches everything;
    *  - `re:<regex>` is a full-match regex;
    *  - `*.domain` (single leading wildcard) also matches the bare domain —
    *    `(^|.*\.)domain$`;
    *  - any other `*`-bearing entry: escape regex metas, `*` → `.*`,
    *    full match;
    *  - otherwise exact comparison.
    */
  private[api] def compilePattern(pattern: String): Compiled = {
    if (pattern == "*") MatchAll
    else if (pattern.startsWith("re:"))
      try Rx(pattern.drop(3).r)
      catch { case _: java.util.regex.PatternSyntaxException => MatchNone }
    else if (pattern.contains("*")) {
      val rx =
        if (pattern.startsWith("*.") && pattern.count(_ == '*') == 1)
          "(^|.*\\.)" + Regex.quote(pattern.drop(2)) + "$"
        // Regex.quote wraps in \Q...\E (the '*' stays literal inside), so
        // the wildcard splice closes and reopens the quote around each '.*'
        else Regex.quote(pattern).replace("*", "\\E.*\\Q")
      try Rx(rx.r)
      catch { case _: java.util.regex.PatternSyntaxException => MatchNone }
    } else Exact(pattern)
  }

  /** Uncached single-pattern match — the spec-level primitive mirroring the
    * reference's `_match_pattern` (and its test_match_pattern_basic cases).
    */
  def matchPattern(value: Option[String], pattern: Option[String]): Boolean =
    (value, pattern) match {
      case (Some(v), Some(p)) => compilePattern(p).matches(v)
      case _                  => false
    }

  /** `_is_allowed`: any-of over the list; empty list allows nothing. */
  def isAllowed(value: Option[String], allowed: Seq[String]): Boolean =
    value.exists(v => allowed.exists(p => compilePattern(p).matches(v)))

  /** Hostname part of a Host header (strips `:port`), lowercased —
    * tenant_security.py:213 `host.split(":")[0].lower()`.
    */
  def hostOnly(hostHeader: String): String =
    hostHeader.split(":")(0).toLowerCase

  /** The localhost equivalence set (tenant_security.py:289). */
  private val LocalhostAliases = Set("localhost", "127.0.0.1", "[::1]")

  /** Hostname of an Origin header value: strip scheme and port. Mirrors
    * urlparse(...).hostname with the `or origin_header` fallback
    * (tenant_security.py:282-284) — a schemeless origin falls back to the
    * raw value, then loses its `:port` via the same split.
    */
  def originHost(origin: String): String = {
    val afterScheme = origin.indexOf("://") match {
      case -1 => origin
      case i  => origin.substring(i + 3)
    }
    hostOnly(afterScheme.split("/")(0))
  }

  /** Trusted-host verdict. `blocked` carries the reference's 403 detail. */
  sealed trait HostVerdict
  case object HostAllowed extends HostVerdict
  final case class HostBlocked(detail: String) extends HostVerdict

  /** CORS verdict: `Preflight` = the 204 short-circuit with headers;
    * `Pass` = proceed and append headers; `CorsBlocked` = the 403.
    */
  sealed trait CorsVerdict
  final case class Preflight(headers: Map[String, String]) extends CorsVerdict
  final case class Pass(headers: Map[String, String]) extends CorsVerdict
  final case class CorsBlocked(detail: String) extends CorsVerdict

  /** The standard CORS header block (cors_preflight / apply_cors_headers,
    * tenant_security.py:128-165): echo `allow` (or `*` when empty).
    */
  def corsHeaders(allowOrigin: Option[String]): Map[String, String] = Map(
    "Access-Control-Allow-Origin"      -> allowOrigin.getOrElse("*"),
    "Access-Control-Allow-Methods"     -> "*",
    "Access-Control-Allow-Headers"     -> "*",
    "Access-Control-Allow-Credentials" -> "true")

  /** Caller credentials for the authenticated fallbacks: the engine's
    * (clientId, secret) pair stands in for the reference's bearer token
    * (extract_token + key_manager.authenticate_client).
    */
  final case class Credentials(clientId: String, secret: String)

  /** The per-tenant gate. `globalTrustedHosts` / `globalCorsOrigins` are
    * the APP_SETTINGS.security fallbacks the middleware uses when the
    * tenant has no config entry (tenant_security.py:205-208, 262-266).
    */
  final class Gate(
      cat: VectorStoreCatalog,
      globalTrustedHosts: Seq[String] = Seq("*"),
      globalCorsOrigins: Seq[String] = Seq("*")) {

    /** Compiled pattern lists keyed by the raw comma-joined config string:
      * a config change changes the key, so stale compilations are simply
      * never hit again (and the map stays tiny — one live entry per
      * distinct configured list).
      */
    private val compiledCache = new ConcurrentHashMap[String, IndexedSeq[Compiled]]()

    private def compiledList(raw: Seq[String]): IndexedSeq[Compiled] =
      compiledCache.computeIfAbsent(raw.mkString(","),
        _ => raw.iterator.map(compilePattern).toIndexedSeq)

    private def configList(tenant: String, key: String): Seq[String] =
      try cat.configGet(tenant, key).map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      catch { case scala.util.control.NonFatal(_) => Nil }

    /** Tenant list with global fallback (empty tenant list → global). */
    def trustedHosts(tenant: String): Seq[String] = {
      val t = configList(tenant, "security.trusted_hosts")
      if (t.nonEmpty) t else globalTrustedHosts
    }

    def corsOrigins(tenant: String): Seq[String] = {
      val t = configList(tenant, "security.cors_origins")
      if (t.nonEmpty) t else globalCorsOrigins
    }

    private def matchesAny(value: String, list: Seq[String]): Boolean =
      compiledList(list).exists(_.matches(value))

    /** True when the credentials authenticate AND the client's grants
      * include `superadmin` — the reference's
      * `client_type == "superadmin"` bypass (tenant_security.py:222-233).
      */
    private def isSuperadmin(tenant: String, cred: Option[Credentials]): Boolean =
      cred.exists(c =>
        try cat.authenticate(tenant, c.clientId, c.secret) &&
          cat.grants(tenant, c.clientId).contains("superadmin")
        catch { case scala.util.control.NonFatal(_) => false })

    private def isAuthenticated(tenant: String, cred: Option[Credentials]): Boolean =
      cred.exists(c =>
        try cat.authenticate(tenant, c.clientId, c.secret)
        catch { case scala.util.control.NonFatal(_) => false })

    /** TenantTrustedHostMiddleware.dispatch: hostname vs the tenant's
      * trusted list (lowercased), superadmin bypass on miss.
      */
    def checkHost(tenant: String, hostHeader: String,
        cred: Option[Credentials] = None): HostVerdict = {
      val hostname = hostOnly(hostHeader)
      if (matchesAny(hostname, trustedHosts(tenant).map(_.toLowerCase)))
        HostAllowed
      else if (isSuperadmin(tenant, cred)) HostAllowed
      else HostBlocked("Untrusted host")
    }

    /** TenantCorsMiddleware.dispatch. Decision order mirrors the
      * reference exactly:
      *  1. same-origin by hostname (localhost aliases equivalent) →
      *     allow, echo the Origin;
      *  2. restricted origins + an Origin header that matches neither the
      *     full origin nor its hostname →
      *     a. trusted Host + authenticated client → allow, echo Origin;
      *     b. superadmin → allow, echo Origin;
      *     c. blocked (403);
      *  3. otherwise allow; echoed value is `*` when the list has `*`,
      *     else the Origin header, else the joined list.
      */
    def checkCors(tenant: String, method: String, hostHeader: String,
        originHeader: Option[String],
        cred: Option[Credentials] = None): CorsVerdict = {
      val origins = corsOrigins(tenant)
      val hostname = hostOnly(hostHeader)
      val oHost = originHeader.map(originHost)

      def allowWith(echo: Option[String]): CorsVerdict =
        if (method == "OPTIONS") Preflight(corsHeaders(echo))
        else Pass(corsHeaders(echo))

      val sameOrigin = (originHeader, oHost) match {
        case (Some(_), Some(oh)) =>
          oh.nonEmpty && hostname.nonEmpty &&
            (oh == hostname ||
              (LocalhostAliases(oh) && LocalhostAliases(hostname)))
        case _ => false
      }
      if (sameOrigin) return allowWith(originHeader)

      if (!origins.contains("*") && originHeader.isDefined) {
        val allowed = matchesAny(originHeader.get, origins) ||
          oHost.exists(matchesAny(_, origins))
        if (!allowed) {
          val hostTrusted =
            matchesAny(hostname, trustedHosts(tenant).map(_.toLowerCase))
          if (hostTrusted && isAuthenticated(tenant, cred))
            return allowWith(originHeader)
          if (isSuperadmin(tenant, cred))
            return allowWith(originHeader)
          return CorsBlocked("CORS origin not allowed")
        }
      }

      val echo =
        if (origins.isEmpty || origins.contains("*")) Some("*")
        else originHeader.orElse(Some(origins.mkString(", ")))
      allowWith(echo)
    }

    /** Visible for the spec: compiled-list cache size (one entry per
      * distinct configured list string ever seen).
      */
    def compiledEntries: Int = compiledCache.size()
  }
}
