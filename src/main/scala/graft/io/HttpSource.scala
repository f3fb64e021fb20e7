package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REST API source — the reference's `APIClient` surface re-expressed as
  * a driver-side fetch-to-staging connector (ext/clients.py:70-448;
  * SURVEY.md §2.1 A4): the engine stays pure (executors read files),
  * while the connector carries the reference's resilience knobs —
  * connect/read timeouts (5.01 s / 32 s), bounded retries with
  * exponential backoff (total 5, factor 0.3), a force-retry status
  * list {409,500,502,503,504,598,599} (ext/clients.py:15-19, 349-366),
  * and the auth surface: static credentials (`HTTPAuthenticator`,
  * clients.py:369-420 — headers/params/cookies attached to every
  * request) plus the login flow (`HTTPLogin`, clients.py:423-448 — a
  * login request whose JSON response BECOMES the session auth, exactly
  * the reference's `auth_handler`/`login_handler` chain), with one
  * re-login retry on 401 for expired tokens.
  */

/** Static request decoration, mirroring `HTTPAuthenticator`: headers
  * merged in, params appended to the query string, cookies sent as a
  * `Cookie` header. Empty maps are no-ops (the reference deletes unset
  * attributes). */
final case class HttpAuth(
    headers: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty,
    cookies: Map[String, String] = Map.empty) {
  def isEmpty: Boolean = headers.isEmpty && params.isEmpty && cookies.isEmpty
  def merged(over: HttpAuth): HttpAuth = HttpAuth(
    headers ++ over.headers, params ++ over.params, cookies ++ over.cookies)
}

/** Login event config, mirroring `HTTPLogin` (clients.py:423-448):
  * `method` + absolute `url` (+ optional `endpoint`) are required; the
  * login request itself may carry static auth (the reference passes the
  * `auth` configuration into the login client). The login RESPONSE must
  * be a JSON object whose `headers`/`params`/`cookies` keys form the
  * session auth (`login_handler` returns `r.json()` and feeds it to
  * `HTTPAuthenticator`). */
final case class HttpLoginConfig(
    method: String,
    url: String,
    endpoint: String = "",
    auth: HttpAuth = HttpAuth(),
    body: String = "")

/** Logout event config (reference `logout_handler`, clients.py:306-330):
  * a request fired at session close — token revocation, audit trail.
  * `endpoint` may be empty (the reference logs a hint and posts to the
  * base URL). */
final case class HttpLogoutConfig(
    method: String,
    url: String,
    endpoint: String = "")

final case class HttpSourceConfig(
    connectTimeoutMillis: Long = 5010,
    readTimeoutMillis: Long = 32000,
    maxRetries: Int = 5,
    backoffFactorSeconds: Double = 0.3,
    retryStatuses: Set[Int] = Set(409, 500, 502, 503, 504, 598, 599),
    headers: Map[String, String] = Map.empty,
    auth: HttpAuth = HttpAuth(),
    login: Option[HttpLoginConfig] = None,
    logout: Option[HttpLogoutConfig] = None,
    /** HTTP proxy `host:port` (reference `proxy_handler`,
      * clients.py:331-347 — same proxy for http/https). */
    proxy: Option[String] = None,
    /** Response event hooks (reference session `hooks` +
      * `print_request` logger, clients.py:249-251): called with
      * (method, url, status) after EVERY response, including retried
      * attempts and login/logout events. Observability only — hook
      * failures are swallowed, they cannot fail a fetch. */
    onResponse: Seq[(String, String, Int) => Unit] = Seq.empty)

final class HttpSourceException(msg: String) extends RuntimeException(msg)

object HttpSource {

  private def newClient(cfg: HttpSourceConfig): HttpClient = {
    val b = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMillis))
      // the reference client (requests.Session) follows redirects by
      // default — without this a 301 http->https or trailing-slash
      // redirect fails as "non-retryable status 301". NORMAL follows
      // everything except an https->http downgrade.
      .followRedirects(HttpClient.Redirect.NORMAL)
    cfg.proxy.foreach { p =>
      val (host, port) = p.split(":", 2) match {
        case Array(h, pt) => (h, pt.toInt)
        case _ => (p, 80)
      }
      b.proxy(java.net.ProxySelector.of(new java.net.InetSocketAddress(host, port)))
    }
    b.build()
  }

  private def fireHooks(cfg: HttpSourceConfig, method: String, url: String,
      status: Int): Unit =
    cfg.onResponse.foreach { h =>
      try h(method, url, status) catch { case _: Exception => () }
    }

  private def withQuery(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val qs = params.map { case (k, v) =>
        URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
          URLEncoder.encode(v, StandardCharsets.UTF_8)
      }.mkString("&")
      url + (if (url.contains("?")) "&" else "?") + qs
    }

  private def buildRequest(method: String, url: String, cfg: HttpSourceConfig,
      auth: HttpAuth, body: String = ""): HttpRequest = {
    val reqB = HttpRequest.newBuilder(URI.create(withQuery(url, auth.params)))
      .timeout(Duration.ofMillis(cfg.readTimeoutMillis))
    method.toUpperCase match {
      case "GET" => reqB.GET()
      case "DELETE" => reqB.DELETE()
      case m => reqB.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    // MERGE config and session-auth headers, auth winning and the
    // match case-INSENSITIVE (header names are) — .header() APPENDS,
    // so a key present in both (e.g. a static Authorization in cfg
    // plus a fresh login token) would otherwise be sent as TWO header
    // values, with the stale one still attached after a 401 re-login
    // (requests.Session semantics: session auth overrides)
    val merged = cfg.headers.filterNot { case (k, _) =>
      auth.headers.keys.exists(_.equalsIgnoreCase(k))
    } ++ auth.headers
    merged.foreach { case (k, v) => reqB.setHeader(k, v) }
    // Cookie gets the same one-header discipline: a static Cookie in
    // cfg.headers (already set above) plus session auth cookies must
    // collapse into ONE Cookie header with the session values winning
    // per cookie name — .header() APPENDS, which would keep a stale
    // pre-login cookie alive after a 401 re-login (the exact bug class
    // the case-insensitive merge above closed for Authorization).
    if (auth.cookies.nonEmpty) {
      val staticCookie = merged.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Cookie") => v
      }
      reqB.setHeader("Cookie", mergeCookieHeader(staticCookie, auth.cookies))
    }
    reqB.build()
  }

  /** Merge a static `Cookie:` header value from config with session
    * auth cookies into ONE header value, session winning per cookie
    * name (case-insensitive) — factored for the IoSpec stale-cookie
    * test. Static cookies not shadowed by the session keep their
    * original order; session cookies follow. */
  private[io] def mergeCookieHeader(staticCookie: Option[String],
      sessionCookies: Map[String, String]): String = {
    val staticPairs = staticCookie.toSeq
      .flatMap(_.split(';').iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(n, v) => Some(n -> v)
          case _ => None
        }
      })
    val jar = staticPairs.filterNot { case (n, _) =>
      sessionCookies.keys.exists(_.equalsIgnoreCase(n))
    } ++ sessionCookies
    jar.map { case (k, v) => s"$k=$v" }.mkString("; ")
  }

  /** Parse a login response body into session auth — the
    * `login_handler` → `HTTPAuthenticator(**r.json())` chain. Accepts
    * the reference's kwargs aliases (`headers`/`header`,
    * `params`/`parameters`, `cookies`/`cookie`). */
  private[io] def parseLoginAuth(json: String): HttpAuth = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import scala.jdk.CollectionConverters._
    val root =
      try new ObjectMapper().readTree(json)
      catch {
        case e: Exception =>
          throw new HttpSourceException(s"login response is not JSON: ${e.getMessage}")
      }
    def section(names: String*): Map[String, String] =
      names.iterator.map(root.get).find(n => n != null && n.isObject)
        .map(_.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
    HttpAuth(
      headers = section("headers", "header"),
      params = section("params", "parameters"),
      cookies = section("cookies", "cookie"))
  }

  /** Execute the configured login event and return the granted auth. */
  def login(cfg: HttpSourceConfig): HttpAuth = {
    val lc = cfg.login.getOrElse(
      throw new HttpSourceException("login() called without a login configuration"))
    val req = buildRequest(lc.method, lc.url + lc.endpoint, cfg, lc.auth, lc.body)
    val resp = newClient(cfg).send(req, HttpResponse.BodyHandlers.ofString())
    fireHooks(cfg, lc.method, lc.url + lc.endpoint, resp.statusCode())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new HttpSourceException(
        s"login ${lc.method} ${lc.url}${lc.endpoint} failed with status ${resp.statusCode()}")
    parseLoginAuth(resp.body())
  }

  /** GET `url` with retry/backoff; returns the body. Retries on IO
    * errors and on the configured status list; other non-2xx fail
    * immediately (mirrors urllib3 Retry force-list semantics). When a
    * login flow is configured, logs in up front, and re-logs-in ONCE on
    * a 401 (expired token) before failing. */
  def fetch(url: String, cfg: HttpSourceConfig = HttpSourceConfig()): String = {
    val client = newClient(cfg)
    var auth = cfg.auth.merged(cfg.login.map(_ => login(cfg)).getOrElse(HttpAuth()))
    var reloggedIn = false

    var attempt = 0
    var lastErr: String = ""
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) {
        // urllib3 backoff: factor * 2^(retries-1)
        val sleepMs = (cfg.backoffFactorSeconds * math.pow(2, attempt - 1) * 1000).toLong
        Thread.sleep(sleepMs)
      }
      try {
        val req = buildRequest("GET", url, cfg, auth)
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        fireHooks(cfg, "GET", url, code)
        if (code >= 200 && code < 300) return resp.body()
        else if (code == 401 && cfg.login.isDefined && !reloggedIn) {
          // token expiry: one fresh login, retry without burning a
          // backoff attempt (the server answered; this is not flakiness)
          auth = cfg.auth.merged(login(cfg))
          reloggedIn = true
        } else if (cfg.retryStatuses.contains(code)) {
          lastErr = s"status $code"
          attempt += 1
        } else {
          throw new HttpSourceException(s"GET $url failed with non-retryable status $code")
        }
      } catch {
        case e: HttpSourceException => throw e
        case e: Exception =>
          lastErr = e.getMessage
          attempt += 1
      }
    }
    throw new HttpSourceException(
      s"GET $url failed after ${cfg.maxRetries} retries: $lastErr")
  }

  /** Execute the configured logout event (context-manager close analog,
    * clients.py:253-257 + 306-330). Carries the current session auth so
    * token-revocation endpoints see the token being revoked. No-op when
    * unconfigured (the reference installs a `not_implemented` thunk).
    * Failures are swallowed: a failed logout must not fail the job that
    * already fetched its data. */
  def logout(cfg: HttpSourceConfig, auth: HttpAuth = HttpAuth()): Unit =
    cfg.logout.foreach { lo =>
      try {
        val req = buildRequest(lo.method, lo.url + lo.endpoint, cfg,
          cfg.auth.merged(auth))
        val resp = newClient(cfg).send(req, HttpResponse.BodyHandlers.ofString())
        fireHooks(cfg, lo.method, lo.url + lo.endpoint, resp.statusCode())
      } catch { case _: Exception => () }
    }

  /** Fetch a JSONL payload to a staging file, then hand it to the
    * distributed reader — the fetch is driver-side (small, one API
    * page), the parse/transform is executor-side. */
  def fetchJsonlToStaging(spark: SparkSession, url: String, stagingDir: String,
      name: String, cfg: HttpSourceConfig = HttpSourceConfig()): DataFrame = {
    val body = fetch(url, cfg)
    Files.createDirectories(Paths.get(stagingDir))
    val path = Paths.get(stagingDir, s"$name.jsonl")
    Files.writeString(path, body,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Sources.jsonl(spark, Seq(path.toString))
  }
}
