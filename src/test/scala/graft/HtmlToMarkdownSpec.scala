package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HtmlToMarkdown

/** HTML → markdown conversion (reference: web_fetcher.py:62-100 —
  * markdownify with ATX headings, "-" bullets, backtick code,
  * urljoin'd relative links).
  */
class HtmlToMarkdownSpec extends AnyFunSuite {

  test("headings become ATX and structure survives") {
    val html =
      """<html><head><title>ignored</title><style>p{color:red}</style></head>
        |<body><h1>Top Title</h1><p>Intro paragraph.</p>
        |<h2>Section A</h2><p>Body of A.</p>
        |<h3>Sub A1</h3><p>Deep text.</p></body></html>""".stripMargin
    val md = HtmlToMarkdown.convert(html)
    assert(md.contains("# Top Title"))
    assert(md.contains("## Section A"))
    assert(md.contains("### Sub A1"))
    assert(!md.contains("ignored"))
    assert(!md.contains("color:red"))
    // headings separated from bodies by blank lines (split points)
    assert(md.contains("# Top Title\n\nIntro paragraph."))
  }

  test("lists: unordered dashes, ordered numbering, nesting indents") {
    val html = "<ul><li>alpha</li><li>beta<ul><li>nested</li></ul></li></ul>" +
      "<ol><li>first</li><li>second</li></ol>"
    val md = HtmlToMarkdown.convert(html)
    assert(md.contains("- alpha"))
    assert(md.contains("- beta"))
    assert(md.contains("  - nested"))
    assert(md.contains("1. first"))
    assert(md.contains("2. second"))
  }

  test("links resolve relative hrefs against the page url") {
    val html = """<p>see <a href="/docs/guide.html">the guide</a> and
      |<a href="https://other.example/x">external</a></p>""".stripMargin
    val md = HtmlToMarkdown.convert(html, "https://site.example/a/b.html")
    assert(md.contains("[the guide](https://site.example/docs/guide.html)"))
    assert(md.contains("[external](https://other.example/x)"))
  }

  test("inline code and pre blocks use backticks; pre preserves newlines") {
    val html = "<p>run <code>sbt test</code> now</p>" +
      "<pre>line one\nline two</pre>"
    val md = HtmlToMarkdown.convert(html)
    assert(md.contains("`sbt test`"))
    assert(md.contains("```\nline one\nline two\n```"))
  }

  test("emphasis, entities, images, rules") {
    val html = """<p><strong>bold</strong> &amp; <em>ital</em> &lt;tag&gt; &#169; &#x41;</p>
      |<img src="/i.png" alt="pic"><hr>""".stripMargin
    val md = HtmlToMarkdown.convert(html, "https://s.example/")
    assert(md.contains("**bold** & *ital* <tag> © A"))
    assert(md.contains("![pic](https://s.example/i.png)"))
    assert(md.contains("---"))
  }

  test("script/style/comments dropped; whitespace collapsed") {
    val html = "<body>a<script>var x=1;</script>b<!-- hidden -->c   d\n\n\ne</body>"
    val md = HtmlToMarkdown.convert(html)
    assert(md == "ab c d e" || md == "abc d e", s"got: $md")
    assert(!md.contains("var x"))
    assert(!md.contains("hidden"))
  }

  test("markdown output chunks on headings through the md splitter") {
    val html = (1 to 6).map(i =>
      s"<h2>Part $i</h2><p>${"content sentence. " * 40}</p>").mkString
    val md = HtmlToMarkdown.convert(html)
    val sp = new graft.text.TextSplitter(graft.text.SplitterConfig(
      keepSeparators = true, chunkSize = 120, chunkOverlap = 0, docType = Some("md")))
    val chunks = sp.split(md)
    // every h2 starts a fresh chunk: the md separator table splits at
    // "\n## " (the separator marker itself is attached to the tail of
    // the preceding chunk, reference combine_chunks semantics), so the
    // heading TITLE opens its own chunk instead of a section being cut
    // mid-sentence
    val headingStarts = chunks.count(c =>
      c.text.startsWith("Part ") || c.text.startsWith("## Part"))
    assert(headingStarts >= 6, s"expected heading-aligned chunks, got:\n${chunks.map(_.text.take(30))}")
  }
}
