package graft.io

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}

/** HTTP transport for the Op-1 paginated REST source — the real-socket
  * [[RestSource.PageFetcher]]: GET a list endpoint, parse the JSON page,
  * follow the continuation link the server embeds in each response.
  *
  * Reference: `ServiceAlertConnector.py:43-64` — the OData list shape
  * (`d.results` row array, `d.__next` absolute continuation URL), a
  * session that retries transient HTTP failures, and loud failure on an
  * unparseable page. The paths are parameters because only the transport
  * is generic; the defaults are the reference's.
  *
  * Behavior contract (each row spec-locked against a loopback
  * `com.sun.net.httpserver.HttpServer` in IoSpec — no external network):
  *   - token None → GET `firstUrl`; token Some(u) → GET u (the
  *     continuation link is a full URL, the OData convention).
  *   - 429/503 → honor `Retry-After` (seconds; default `backoffMs` when
  *     absent), retry the SAME url up to `maxRetries` times, then raise
  *     naming the last status. Other non-2xx raise immediately — a 404
  *     is a config error, not a transient.
  *   - Unparseable body or a missing results field raises with a body
  *     snippet: silently yielding zero rows would end pagination and
  *     truncate the ingest, the worst failure mode for a sync job.
  *
  * Numbers parse as Long/Double (`USE_LONG_FOR_INTS`) so downstream
  * schema projection (`RestSource.load`) gets JVM types matching LongType
  * /DoubleType columns; nested objects/arrays survive as Map/Seq for
  * [[RestSource.cleanRecord]] to drop (Op-2). Serializable by
  * construction (config strings only) so the DataSourceV2 path can fetch
  * executor-side. */
class HttpPageFetcher(
    firstUrl: String,
    resultsPath: Seq[String] = Seq("d", "results"),
    nextPath: Seq[String] = Seq("d", "__next"),
    maxRetries: Int = 3,
    backoffMs: Long = 1000L,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000) extends RestSource.PageFetcher {

  override def fetch(token: Option[String])
      : (Seq[Map[String, Any]], Option[String]) = {
    val url = token.getOrElse(firstUrl)
    val body = getWithRetry(url)
    val root =
      try HttpPageFetcher.mapper.readValue(body, classOf[Object])
      catch {
        case e: Exception => throw new RuntimeException(
          s"RestSource: unparseable JSON page at $url " +
            s"(${e.getMessage}); body starts: ${body.take(200)}")
      }
    val page = HttpPageFetcher.toScala(root)
    val rows = dig(page, resultsPath) match {
      case Some(s: Seq[_]) => s.map {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => throw new RuntimeException(
          s"RestSource: non-object row at $url: ${String.valueOf(other).take(100)}")
      }
      case other => throw new RuntimeException(
        s"RestSource: no ${resultsPath.mkString(".")} array at $url " +
          s"(got ${other.map(_.getClass.getSimpleName).getOrElse("nothing")}); " +
          s"body starts: ${body.take(200)}")
    }
    val next = dig(page, nextPath).collect { case s: String if s.nonEmpty => s }
    (rows, next)
  }

  private def dig(v: Any, path: Seq[String]): Option[Any] =
    path.foldLeft(Option(v)) {
      case (Some(m: Map[_, _]), k) =>
        m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  private def getWithRetry(url: String): String = {
    var attempt = 0
    while (true) {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      val code = conn.getResponseCode
      if (code / 100 == 2) {
        val is = conn.getInputStream
        try return new String(is.readAllBytes(), StandardCharsets.UTF_8)
        finally is.close()
      }
      Option(conn.getErrorStream).foreach(_.close())
      if ((code == 429 || code == 503) && attempt < maxRetries) {
        val waitMs = Option(conn.getHeaderField("Retry-After"))
          .flatMap(s => scala.util.Try(s.trim.toLong * 1000L).toOption)
          .getOrElse(backoffMs)
        attempt += 1
        if (waitMs > 0) Thread.sleep(waitMs)
      } else {
        throw new RuntimeException(
          s"RestSource: HTTP $code from $url" +
            (if (attempt > 0) s" after $attempt retries" else ""))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object HttpPageFetcher {
  // ints as Long so JSON numbers land in LongType columns without a cast
  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_LONG_FOR_INTS, true)

  /** Jackson's java.util tree → immutable Scala Map/Seq (recursive). */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      import scala.jdk.CollectionConverters._
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] =>
      import scala.jdk.CollectionConverters._
      l.asScala.map(toScala).toSeq
    case other => other
  }
}
