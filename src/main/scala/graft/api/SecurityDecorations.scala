package graft.api

/** The reference's two remaining response-decoration middlewares, as pure
  * functions over (path, headers, body) — the engine runs no HTTP server,
  * so the facade value is the exact header/body transformation, testable
  * without one:
  *
  *  - OWASP security headers (`app/middleware/security_headers.py:44-176`,
  *    wired at `app/main.py:232-246`): the five fixed headers, HSTS in
  *    production when enabled, and a Content-Security-Policy assembled
  *    from config lists with the reference's token normalization
  *    (keywords re-quoted, surrounding quotes stripped) and its
  *    development-mode websocket allowance.
  *  - Docs-HTML sanitizer (`app/middleware/docs_sanitizer.py:14-76`):
  *    strips the Cloudflare Insights beacon script from HTML served under
  *    the docs paths, leaving every other response untouched.
  */
object SecurityDecorations {

  /** `SECURITY_HEADERS` (security_headers.py:45-57), order preserved. */
  val BaseHeaders: Seq[(String, String)] = Seq(
    "X-Content-Type-Options" -> "nosniff",
    "X-Frame-Options" -> "DENY",
    "X-XSS-Protection" -> "1; mode=block",
    "Referrer-Policy" -> "strict-origin-when-cross-origin",
    "Permissions-Policy" -> ("accelerometer=(), autoplay=(), " +
      "camera=(), encrypted-media=(), fullscreen=(), geolocation=(), " +
      "gyroscope=(), magnetometer=(), microphone=(), payment=(), " +
      "usb=()"))

  /** The CSP source lists of `SecurityConfig`; `None` per field takes the
    * reference's minimal-safe default (security_headers.py:63-121).
    */
  final case class CspConfig(
      scriptSrc: Option[Seq[String]] = None,
      styleSrc: Option[Seq[String]] = None,
      imgSrc: Option[Seq[String]] = None,
      connectSrc: Option[Seq[String]] = None,
      fontSrc: Option[Seq[String]] = None,
      workerSrc: Option[Seq[String]] = None,
      enableHsts: Boolean = true)

  /** Token normalization (security_headers.py:81-91): strip surrounding
    * quotes, then single-quote the CSP keywords.
    */
  private[api] def normalizeToken(tok: String): String = {
    var t = tok.trim
    if (t.length >= 2 &&
        ((t.head == '\'' && t.last == '\'') || (t.head == '"' && t.last == '"')))
      t = t.substring(1, t.length - 1).trim
    if (Set("self", "unsafe-inline", "unsafe-eval", "none").contains(t)) s"'$t'"
    else t
  }

  /** `build_csp` (security_headers.py:58-135): directive defaults, token
    * normalization, and the dev-mode `localhost:* ws:` connect-src
    * extension.
    */
  def buildCsp(cfg: CspConfig, isProduction: Boolean): String = {
    def src(v: Option[Seq[String]], dflt: Seq[String]): String =
      v.getOrElse(dflt).map(normalizeToken).mkString(" ")
    val connectList = cfg.connectSrc.getOrElse(Seq("'self'")) ++
      (if (!isProduction) Seq("localhost:*", "ws:") else Nil)
    "default-src 'self'; " +
      s"script-src ${src(cfg.scriptSrc, Seq("'self'"))}; " +
      s"style-src ${src(cfg.styleSrc, Seq("'self'", "'unsafe-inline'"))}; " +
      s"img-src ${src(cfg.imgSrc, Seq("'self'", "data:", "https:"))}; " +
      s"font-src ${src(cfg.fontSrc, Seq("'self'"))}; " +
      s"connect-src ${connectList.map(normalizeToken).mkString(" ")}; " +
      s"worker-src ${src(cfg.workerSrc, Seq("'self'", "blob:"))}; " +
      "frame-ancestors 'none'; base-uri 'self'; form-action 'self'"
  }

  /** The full header set a response gets (security_headers.py:137-165):
    * base + HSTS (production AND enabled) + CSP.
    */
  def headersToAdd(isProduction: Boolean,
      cfg: CspConfig = CspConfig()): Seq[(String, String)] =
    BaseHeaders ++
      (if (isProduction && cfg.enableHsts)
        Seq("Strict-Transport-Security" ->
          "max-age=31536000; includeSubDomains; preload")
      else Nil) ++
      Seq("Content-Security-Policy" -> buildCsp(cfg, isProduction))

  /** Apply to a response's headers — later values win, like the
    * reference's `response.headers[k] = v` loop.
    */
  def decorate(responseHeaders: Map[String, String], isProduction: Boolean,
      cfg: CspConfig = CspConfig()): Map[String, String] =
    responseHeaders ++ headersToAdd(isProduction, cfg)

  // ---- docs sanitizer ----

  /** Default docs paths (docs_sanitizer.py:28). */
  val DocsPaths: Seq[String] = Seq("/api/v1/docs", "/api/v1/redoc", "/docs", "/redoc")

  private val CfBeacon =
    ("""(?is)<script[^>]*static\.cloudflareinsights\.com[^>]*>.*?</script>""").r

  /** `DocsSanitizerMiddleware.dispatch` (docs_sanitizer.py:31-76): HTML
    * under a docs path gets the Cloudflare beacon script stripped;
    * returns Some(sanitized) only when the body actually changed (the
    * caller then also drops Content-Length, as the reference does) and
    * None for non-docs paths, non-HTML content, or unchanged bodies.
    */
  def sanitizeDocsHtml(path: String, contentType: String, body: String,
      docsPaths: Seq[String] = DocsPaths): Option[String] = {
    if (!docsPaths.exists(path.startsWith) ||
        !contentType.toLowerCase.contains("html")) return None
    val cleaned = CfBeacon.replaceAllIn(body, "")
    if (cleaned != body) Some(cleaned) else None
  }
}
