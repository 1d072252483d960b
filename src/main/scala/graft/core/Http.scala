package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.GZIPInputStream

/** Result of a fetch. The engine's contract mirrors the reference's
  * graceful-degradation philosophy (reference: src/sudan/http_client.cpp:159-203):
  * transport/HTTP errors become `Left` and ultimately zero rows, never a
  * query failure. Argument errors, by contrast, throw at load()/analysis.
  */
final case class FetchError(url: String, message: String)

/** Injectable HTTP layer so every networked source is testable offline
  * against recorded fixtures (FIXTURES.md §1). Implementations MUST be
  * cheap to construct on executors — readers construct them from a
  * serialized spec (see [[FetcherSpec]]).
  */
trait HttpFetcher extends Serializable {
  def get(url: String): Either[FetchError, String]
}

/** Production fetcher on java.net.http: 90 s timeouts, follows redirects,
  * transparent gzip (parity with reference http_client.cpp:62-205). */
final class JavaHttpFetcher(timeoutSeconds: Long = 90L) extends HttpFetcher {
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  override def get(url: String): Either[FetchError, String] =
    ResponseCache.getOrFetch(url) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(timeoutSeconds))
          .header("Accept-Encoding", "gzip")
          .header("User-Agent", "graft-spark/0.1")
          .GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 != 2) {
          Left(FetchError(url, s"HTTP ${resp.statusCode()}"))
        } else {
          val gz = resp.headers().firstValue("Content-Encoding").orElse("")
          val bytes =
            if (gz.contains("gzip"))
              new GZIPInputStream(new java.io.ByteArrayInputStream(resp.body())).readAllBytes()
            else resp.body()
          Right(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        }
      } catch {
        case e: Exception => Left(FetchError(url, Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
}

/** Offline fetcher: resolves URLs to recorded fixture bodies. Fixtures are
  * matched by longest matching substring key, so a fixture map like
  * `"api.worldbank.org" -> body` serves every page of that API. Missing
  * fixture behaves like a network failure (Left → 0 rows). */
final class FixtureFetcher(fixtures: Map[String, String]) extends HttpFetcher {
  override def get(url: String): Either[FetchError, String] = {
    val hit = fixtures.keysIterator.filter(url.contains).maxByOption(_.length)
    hit.map(k => Right(fixtures(k)))
      .getOrElse(Left(FetchError(url, "no fixture for url")))
  }
}

/** Serializable description of which fetcher a DSv2 reader should build on
  * the executor. `mode=http` → live client; `mode=fixtures` → bodies loaded
  * from a classpath-resource directory keyed by URL substrings in an
  * `index.json` (map of substring -> resource file name). */
final case class FetcherSpec(mode: String, fixtureResource: String = "") extends Serializable {
  def build(): HttpFetcher = mode match {
    case "fixtures" => new FixtureFetcher(Fixtures.load(fixtureResource))
    case "http"     => new JavaHttpFetcher()
    case other => throw new IllegalArgumentException(
      s"unknown fetcher mode '$other' (expected 'http' or 'fixtures')")
  }
}

object Fixtures {
  /** Load a fixture index from the classpath: `<dir>/index.json` maps URL
    * substring -> resource file in the same directory. */
  def load(dir: String): Map[String, String] = {
    val idx = resource(s"$dir/index.json")
    Json.parse(idx).map { node =>
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> resource(s"$dir/${e.getValue.asText()}")
      }
      b.result()
    }.getOrElse(Map.empty)
  }

  def resource(path: String): String = {
    val in = Option(getClass.getClassLoader.getResourceAsStream(path))
      .getOrElse(throw new IllegalArgumentException(s"resource not found: $path"))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}

/** Process-wide URL→body cache with TTL expiry on read, mirroring the
  * reference's session cache (cache.hpp:11-35, 300 s TTL). On a cluster each
  * executor JVM holds its own instance — acceptable: the cache is a courtesy
  * to the upstream APIs, not a correctness feature. */
object ResponseCache {
  final val TtlMillis: Long = 300L * 1000
  private val cache = new ConcurrentHashMap[String, (String, Long)]()

  def getOrFetch(url: String)(fetch: => Either[FetchError, String]): Either[FetchError, String] = {
    val now = System.currentTimeMillis()
    val cached = cache.get(url)
    if (cached != null && now - cached._2 < TtlMillis) Right(cached._1)
    else {
      if (cached != null) cache.remove(url, cached) // evict expired entry
      fetch match {
        case r @ Right(body) => cache.put(url, (body, now)); r
        case l => l
      }
    }
  }

  def clear(): Unit = cache.clear()
  def size: Int = cache.size()
}
