package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REST API source — the reference's `APIClient` surface re-expressed as
  * a driver-side fetch-to-staging connector (ext/clients.py:70-448;
  * SURVEY.md §2.1 A4): the engine stays pure (executors read files),
  * while the connector carries the reference's resilience knobs —
  * connect/read timeouts (5.01 s / 32 s), bounded retries with
  * exponential backoff (total 5, factor 0.3), and a force-retry status
  * list {409,500,502,503,504,598,599} (ext/clients.py:15-19, 349-366).
  */
final case class HttpSourceConfig(
    connectTimeoutMillis: Long = 5010,
    readTimeoutMillis: Long = 32000,
    maxRetries: Int = 5,
    backoffFactorSeconds: Double = 0.3,
    retryStatuses: Set[Int] = Set(409, 500, 502, 503, 504, 598, 599),
    headers: Map[String, String] = Map.empty)

final class HttpSourceException(msg: String) extends RuntimeException(msg)

object HttpSource {

  /** GET `url` with retry/backoff; returns the body. Retries on IO
    * errors and on the configured status list; other non-2xx fail
    * immediately (mirrors urllib3 Retry force-list semantics). */
  def fetch(url: String, cfg: HttpSourceConfig = HttpSourceConfig()): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(cfg.connectTimeoutMillis))
      .build()
    val reqB = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.readTimeoutMillis))
      .GET()
    cfg.headers.foreach { case (k, v) => reqB.header(k, v) }
    val req = reqB.build()

    var attempt = 0
    var lastErr: String = ""
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) {
        // urllib3 backoff: factor * 2^(retries-1)
        val sleepMs = (cfg.backoffFactorSeconds * math.pow(2, attempt - 1) * 1000).toLong
        Thread.sleep(sleepMs)
      }
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) return resp.body()
        else if (cfg.retryStatuses.contains(code)) {
          lastErr = s"status $code"
        } else {
          throw new HttpSourceException(s"GET $url failed with non-retryable status $code")
        }
      } catch {
        case e: HttpSourceException => throw e
        case e: Exception => lastErr = e.getMessage
      }
      attempt += 1
    }
    throw new HttpSourceException(
      s"GET $url failed after ${cfg.maxRetries} retries: $lastErr")
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
