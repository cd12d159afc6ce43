package graft

import org.apache.spark.sql.functions._

import graft.sources.WebFetcher
import graft.sources.WebFetcher.{HttpResponse, HttpTransport}

/** The web fetch contract (reference: web_fetcher.py:32-60) with
  * scripted transports: header construction, status failure,
  * content-type allow-list (parameters stripped), doc-type dispatch
  * (html → markdown, text/plain and the rest → raw), and the
  * executor-parallel bulk path with per-row error capture.
  */
class WebFetcherSpec extends SparkSpecBase {

  import WebFetcherSpec.MapTransport

  test("default headers fill Host and Alt-Used from the uri host") {
    val h = WebFetcher.defaultHeaders("https://example.org/a/b?q=1")
    assert(h("Host") == "example.org" && h("Alt-Used") == "example.org")
    assert(h("Referer") == "https://www.google.com/")
    assert(h.contains("User-Agent") && h.size == 12)
  }

  test("html converts to markdown; other allowed types pass through raw") {
    val f = new WebFetcher(new MapTransport(Map(
      "https://a/x.html" -> HttpResponse(200, "text/html; charset=utf-8",
        "<html><body><h1>Title</h1><p>Hello <b>world</b></p></body></html>"),
      "https://a/x.json" -> HttpResponse(200, "application/json", """{"k": 1}"""),
      "https://a/x.txt" -> HttpResponse(200, "text/plain", "plain text"))))
    val mdOut = f.fetch("https://a/x.html")
    assert(mdOut.contains("Title") && mdOut.contains("Hello") && !mdOut.contains("<h1>"))
    assert(f.fetch("https://a/x.json") == """{"k": 1}""")
    assert(f.fetch("https://a/x.txt") == "plain text")
    // htmlToMarkdown=false passes html through raw (reference config)
    val raw = new WebFetcher(new MapTransport(Map(
      "https://a/x.html" -> HttpResponse(200, "text/html", "<p>x</p>"))),
      htmlToMarkdown = false)
    assert(raw.fetch("https://a/x.html") == "<p>x</p>")
  }

  test("non-2xx and disallowed content types fail with the reference's messages") {
    val f = new WebFetcher(new MapTransport(Map(
      "https://a/gone" -> HttpResponse(404, "text/html", ""),
      "https://a/pdf" -> HttpResponse(200, "application/pdf", "%PDF"),
      "https://a/none" -> HttpResponse(200, "", "x"))))
    assert(intercept[java.io.IOException](f.fetch("https://a/gone"))
      .getMessage.contains("status 404"))
    assert(intercept[java.io.IOException](f.fetch("https://a/pdf"))
      .getMessage.contains("invalid content type of application/pdf"))
    assert(intercept[java.io.IOException](f.fetch("https://a/none"))
      .getMessage.contains("invalid content type"))
  }

  test("fetchAll runs on executors and captures per-row errors") {
    import spark.implicits._
    val f = new WebFetcher(new MapTransport(Map(
      "https://a/1" -> HttpResponse(200, "text/plain", "one"),
      "https://a/2" -> HttpResponse(200, "application/pdf", "nope"))))
    val out = f.fetchAll(Seq("https://a/1", "https://a/2", "https://a/3").toDF("uri"))
      .orderBy("uri").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "one" && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getString(2).contains("invalid content type"))
    assert(out(2).isNullAt(1) && out(2).getString(2).contains("status 404"))
  }
}

object WebFetcherSpec {
  /** Serves a fixed map of uri → response; anything else 404s.
    * Top-level (not an inner class) so mapPartitions closures don't
    * capture the test suite — the executor-safety rule the transport
    * trait documents.
    */
  final class MapTransport(pages: Map[String, HttpResponse]) extends HttpTransport {
    def get(uri: String, headers: Map[String, String]): HttpResponse =
      pages.getOrElse(uri, HttpResponse(404, "text/plain", "not found"))
  }
}
