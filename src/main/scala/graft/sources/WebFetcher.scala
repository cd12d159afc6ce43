package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's web fetch contract as pure, transport-injected
  * logic (reference: web_fetcher.py:32-60 fetch): build the browser
  * header set with Host/Alt-Used derived from the uri, GET, fail on
  * non-2xx, enforce the content-type allow-list, then dispatch —
  * text/html converts through [[HtmlToMarkdown]] (the reference's
  * html_to_markdown, web_fetcher.py:62-88, already implemented), all
  * other allowed types pass through raw.
  *
  * Zero-egress build: the HTTP GET itself is abstracted as
  * [[WebFetcher.HttpTransport]] — the same pattern as the embeddings
  * client's EmbeddingTransport (tests inject scripted fakes; a
  * production deployment supplies a real client). Redirect following
  * is a TRANSPORT responsibility, mirroring the reference, whose
  * `requests.get` resolves redirects before fetch() sees a response.
  * Transports must be executor-safe (Serializable, lazily-initialized
  * connections) because [[fetchAll]] runs them inside mapPartitions —
  * fetching a crawl frontier is executor-parallel work, never a
  * driver loop.
  */
final class WebFetcher(
    transport: WebFetcher.HttpTransport,
    htmlToMarkdown: Boolean = true) extends Serializable {

  import WebFetcher._

  /** reference: web_fetcher.py:43-60. */
  def fetch(uri: String): String = {
    val r = transport.get(uri, defaultHeaders(uri))
    if (r.statusCode < 200 || r.statusCode >= 300)
      throw new java.io.IOException(s"GET $uri returned status ${r.statusCode}")
    // "text/html; charset=utf-8" → "text/html" (parameters ignored)
    val ct = r.contentType.split(";")(0)
    if (ct.isEmpty || !AllowedContentTypes.contains(ct))
      throw new java.io.IOException(
        s"Site returned an invalid content type of ${r.contentType}")
    // doc_type = subtype, except text/plain which has none
    val docType = if (ct == "text/plain") null else ct.split("/")(1)
    if (docType == "html" && htmlToMarkdown) HtmlToMarkdown.convert(r.body, uri)
    else r.body
  }

  /** Executor-parallel bulk fetch of a uri column: one transport per
    * partition, failures captured per row (a crawl must not die on
    * one bad host — the `error` column carries the reference's
    * exception message; `text` is null for failed rows).
    */
  def fetchAll(uris: DataFrame, uriCol: String = "uri"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val self = this
    val schema = StructType(Seq(
      StructField("uri", StringType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("error", StringType, nullable = true)))
    uris.select(uriCol).mapPartitions { it =>
      it.map { row =>
        val uri = row.getString(0)
        try Row(uri, self.fetch(uri), null)
        catch { case e: Exception => Row(uri, null, e.getMessage) }
      }
    }(Encoders.row(schema))
  }
}

object WebFetcher {

  /** reference: web_fetcher.py:8-14 ALLOWED_CONTENT_TYPES. */
  val AllowedContentTypes: Seq[String] = Seq(
    "text/html", "application/json", "application/xml",
    "application/javascript", "text/plain")

  /** One GET. Implementations must follow redirects (like requests'
    * default) and be executor-safe: Serializable with any live
    * connection state held in @transient lazy fields.
    */
  trait HttpTransport extends Serializable {
    def get(uri: String, headers: Map[String, String]): HttpResponse
  }

  final case class HttpResponse(statusCode: Int, contentType: String, body: String)

  /** reference: web_fetcher.py:16-29 DEFAULT_HEADERS — the browser
    * header set, with Host and Alt-Used filled from the uri's host
    * (web_fetcher.py:44-47).
    */
  def defaultHeaders(uri: String): Map[String, String] = {
    val host = try Option(java.net.URI.create(uri).getHost).getOrElse("")
      catch { case _: IllegalArgumentException => "" }
    Map(
      "Accept" -> "text/html,application/xhtml+xml,application/xml;q=0.9,image/avif,image/webp,*/*;q=0.8",
      "Accept-Encoding" -> "gzip, deflate",
      "Accept-Language" -> "en-US,en;q=0.5",
      "Alt-Used" -> host,
      "Connection" -> "keep-alive",
      "Host" -> host,
      "Referer" -> "https://www.google.com/",
      "Sec-Fetch-Dest" -> "document",
      "Sec-Fetch-Mode" -> "navigate",
      "Sec-Fetch-Site" -> "cross-site",
      "Upgrade-Insecure-Requests" -> "1",
      "User-Agent" -> "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/111.0")
  }
}
